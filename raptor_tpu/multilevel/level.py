"""One level of an AMG hierarchy (host-side description).

Equivalent of ParLevel (multilevel/par_level.hpp:15-43)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from raptor_tpu.core.par_matrix import ParCSRMatrix


@dataclasses.dataclass
class Level:
    A: ParCSRMatrix
    P: Optional[ParCSRMatrix] = None
    # SA only: candidate vectors injected into the tentative prolongator
    B: Optional[np.ndarray] = None
