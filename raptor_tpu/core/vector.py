"""Distributed vector (host-side description).

Equivalent of the reference's ``ParVector`` (core/par_vector.hpp:44-176) —
a global vector plus a row partition. Norms and inner products are global
reductions (par_vector.cpp:88,101); on device they become ``psum`` over the
mesh axis (see raptor_tpu.device.par).
"""

from __future__ import annotations

import numpy as np

from raptor_tpu.core.partition import Partition


class ParVector:
    def __init__(self, values: np.ndarray, partition: Partition):
        self.values = np.asarray(values, dtype=np.float64)
        self.partition = partition

    @staticmethod
    def zeros(partition: Partition) -> "ParVector":
        return ParVector(np.zeros(partition.global_num_rows), partition)

    def norm(self, p: int = 2) -> float:
        if p == 2:
            return float(np.linalg.norm(self.values))
        return float(np.sum(np.abs(self.values) ** p) ** (1.0 / p))

    def inner_product(self, other: "ParVector") -> float:
        return float(self.values @ other.values)

    def copy(self) -> "ParVector":
        return ParVector(self.values.copy(), self.partition)

    # reference Vector ops (core/vector.cpp): set_const_value/axpy/scale
    def set_const_value(self, alpha: float) -> "ParVector":
        self.values[:] = alpha
        return self

    def axpy(self, other: "ParVector", alpha: float) -> "ParVector":
        """self += alpha * other (core/vector.cpp axpy)."""
        self.values += alpha * other.values
        return self

    def scale(self, alpha: float) -> "ParVector":
        self.values *= alpha
        return self

    @property
    def local(self) -> np.ndarray:
        """This shard-view API is host-global; ``local`` of shard s is
        obtained via the partition bounds."""
        return self.values

    def local_slice(self, s: int) -> np.ndarray:
        b = self.partition.row_bounds
        return self.values[int(b[s]):int(b[s + 1])]
