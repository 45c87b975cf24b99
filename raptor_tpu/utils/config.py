"""Configuration system for solvers.

The reference exposes knobs as constructor args / public members
(par_multilevel.hpp:628-660) plus env vars (PPN etc., core/topology.hpp:43).
Here the full knob set is one dataclass, serializable, with a factory."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from raptor_tpu.core.types import (
    AggType, CoarsenType, InterpType, ProlongType, RelaxType, StrengthType)


@dataclasses.dataclass
class AMGConfig:
    # method selection
    method: str = "ruge_stuben"            # "ruge_stuben" | "smoothed_agg"
    # strength / coarsening / interpolation
    strong_threshold: float = 0.0
    strength_type: StrengthType = StrengthType.Classical
    coarsen_type: CoarsenType = CoarsenType.RS
    interp_type: InterpType = InterpType.Direct
    interp_filter: float = 0.3
    # aggregation (SA)
    agg_type: AggType = AggType.MIS
    prolong_type: ProlongType = ProlongType.JacobiProlongation
    prolong_smooth_steps: int = 1
    prolong_weight: float = 4.0 / 3.0
    # smoothing
    relax_type: RelaxType = RelaxType.SOR
    num_smooth_sweeps: int = 1
    relax_weight: float = 1.0
    # hierarchy limits (par_multilevel.hpp:83-94)
    max_coarse: int = 50
    max_levels: int = 25
    sparsify_tol: float = 0.0
    # solve
    solve_tol: float = 1e-07
    max_iterations: int = 100
    # topology (TAPComm: first level using node-aware comm; -1 = off)
    tap_amg: int = -1
    # setup engines: "host" (native kernels, bit-parity), "device"
    # (TPU: device/spgemm.py + device/interp.py), "auto" (device for
    # large levels on a real TPU)
    rap_mode: str = "auto"
    interp_mode: str = "auto"
    # setup distribution: "global" (host-global) or "distributed"
    # (per-shard stages over the Transport seam)
    setup_mode: str = "global"
    # device
    dtype: str = "float64"
    lane_pad: int = 1

    def build(self, weights: Optional[np.ndarray] = None):
        """Instantiate the configured solver."""
        if self.method == "ruge_stuben":
            from raptor_tpu.multilevel.par_multilevel import (
                ParRugeStubenSolver)
            ml = ParRugeStubenSolver(
                self.strong_threshold, self.coarsen_type, self.interp_type,
                self.strength_type, self.relax_type)
            ml.interp_filter = self.interp_filter
        elif self.method == "smoothed_agg":
            from raptor_tpu.aggregation.solver import (
                ParSmoothedAggregationSolver)
            st = (self.strength_type
                  if self.strength_type != StrengthType.Classical
                  else StrengthType.Symmetric)
            ml = ParSmoothedAggregationSolver(
                self.strong_threshold, self.agg_type, self.prolong_type,
                st, self.relax_type, self.prolong_smooth_steps,
                self.prolong_weight)
        else:
            raise ValueError(f"unknown method {self.method}")
        ml.num_smooth_sweeps = self.num_smooth_sweeps
        ml.relax_weight = self.relax_weight
        ml.max_coarse = self.max_coarse
        ml.max_levels = self.max_levels
        ml.solve_tol = self.solve_tol
        ml.max_iterations = self.max_iterations
        ml.tap_amg = self.tap_amg
        ml.rap_mode = self.rap_mode
        ml.interp_mode = self.interp_mode
        ml.setup_mode = self.setup_mode
        if weights is not None:
            ml.weights = np.asarray(weights, dtype=np.float64)
        return ml

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        for k, v in d.items():
            if isinstance(v, (StrengthType, CoarsenType, InterpType,
                              AggType, ProlongType, RelaxType)):
                d[k] = v.name
        return d

    @staticmethod
    def from_dict(d: dict) -> "AMGConfig":
        enums = {"strength_type": StrengthType, "coarsen_type": CoarsenType,
                 "interp_type": InterpType, "agg_type": AggType,
                 "prolong_type": ProlongType, "relax_type": RelaxType}
        kw = dict(d)
        for k, enum_cls in enums.items():
            if k in kw and isinstance(kw[k], str):
                kw[k] = enum_cls[kw[k]]
        return AMGConfig(**kw)
