"""Smoothed-aggregation AMG solver
(aggregation/par_smoothed_aggregation_solver.hpp:14-150)."""

from __future__ import annotations

import numpy as np

from raptor_tpu.aggregation.aggregate import aggregate
from raptor_tpu.aggregation.candidates import fit_candidates
from raptor_tpu.aggregation.mis import mis2
from raptor_tpu.aggregation.prolongation import jacobi_prolongation
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.core.types import AggType, ProlongType, RelaxType, StrengthType
from raptor_tpu.multilevel.level import Level
from raptor_tpu.multilevel.par_multilevel import ParMultilevel
from raptor_tpu.ruge_stuben.strength import strength


class ParSmoothedAggregationSolver(ParMultilevel):
    def __init__(self, strong_threshold: float = 0.0,
                 agg_type: AggType = AggType.MIS,
                 prolong_type: ProlongType = ProlongType.JacobiProlongation,
                 strength_type: StrengthType = StrengthType.Symmetric,
                 relax_type: RelaxType = RelaxType.SOR,
                 prolong_smooth_steps: int = 1,
                 prolong_weight: float = 4.0 / 3.0):
        super().__init__(strong_threshold, strength_type, relax_type)
        self.agg_type = agg_type
        self.prolong_type = prolong_type
        self.num_candidates = 1
        self.interp_tol = 1e-10
        self.prolong_smooth_steps = prolong_smooth_steps
        self.prolong_weight = prolong_weight
        self.B: np.ndarray = None

    def setup(self, af: ParCSRMatrix) -> None:
        self.B = np.ones(af.global_num_rows)
        self.setup_helper(af)

    def extend_hierarchy(self) -> None:
        level_ctr = len(self.levels) - 1
        a = self.levels[level_ctr].A
        n = a.global_num_rows
        w = self.weights[:n]

        if getattr(self, "setup_mode", "global") == "distributed":
            # per-shard + transport stages (par_mis.cpp, par_aggregate.cpp,
            # par_candidates.cpp, par_prolongation.cpp equivalents)
            from raptor_tpu.ruge_stuben import par_setup as ps
            masks = ps.dist_symmetric_strength(a, self.strong_threshold)
            s_par = ps.strength_masks_to_par(a, masks)
            states = ps.dist_mis2(s_par, w)
            # the production solver aggregates WITHOUT rand tie-breaks
            # (par_smoothed_aggregation_solver.hpp:80 passes no
            # rand_vals; only the unit tests pass weights.txt) — found
            # by the live reference oracle on lap27
            n_aggs, aggs = ps.dist_aggregate(a, s_par, states)
            t, r = ps.dist_fit_candidates(a, n_aggs, aggs, self.B[:n],
                                          self.interp_tol)
            p = ps.dist_jacobi_prolongation(a, t, self.prolong_weight,
                                            self.prolong_smooth_steps)
        else:
            with self.setup_times.phase("strength"):
                s = strength(a.global_csr, self.strength_type,
                             self.strong_threshold)
            with self.setup_times.phase("aggregation"):
                states = mis2(s, w)
                # no rand tie-breaks in the production solver (see the
                # distributed branch note)
                n_aggs, aggs = aggregate(a.global_csr, s, states)
            with self.setup_times.phase("candidates"):
                t, r = fit_candidates(n_aggs, aggs, self.B[:n],
                                      self.num_candidates,
                                      self.interp_tol)
            with self.setup_times.phase("prolongation"):
                p = jacobi_prolongation(a.global_csr, t,
                                        self.prolong_weight,
                                        self.prolong_smooth_steps)

        # coarse cols partitioned by root ownership (roots in row order)
        row_bounds = a.partition.row_bounds
        sel = states > 0
        csum = np.concatenate([[0], np.cumsum(sel)])
        col_bounds = csum[row_bounds].astype(np.int64)
        part = Partition(n, p.n_cols, a.partition.n_shards, row_bounds,
                         col_bounds)
        pp = ParCSRMatrix(p, part)
        self.levels[level_ctr].P = pp

        if getattr(self, "setup_mode", "global") == "distributed":
            # Galerkin product over the transport seam too
            # (par_matmult.cpp:79-441 for the SA pipeline)
            from raptor_tpu.ruge_stuben import par_setup as ps
            with self.setup_times.phase("RAP"):
                ac_csr = ps.dist_rap(a, p, coarse_bounds=col_bounds)
            ac = ParCSRMatrix(
                ac_csr.canonicalize(),
                Partition(p.n_cols, p.n_cols, a.partition.n_shards,
                          col_bounds, col_bounds))
        else:
            with self.setup_times.phase("RAP"):
                # host engine = native transpose-SpGEMM; large levels on
                # a real TPU route through device/spgemm.py (rap_mode)
                _, ac = self._galerkin(a, pp, need_ap=False)
        self.levels.append(Level(A=ac))
        self.B = r[:n_aggs * self.num_candidates]
