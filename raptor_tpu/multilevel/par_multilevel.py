"""AMG hierarchy setup drivers (host) — the equivalent of
``ParMultilevel`` (multilevel/par_multilevel.hpp:69-661) and
``ParRugeStubenSolver`` (ruge_stuben/par_ruge_stuben_solver.hpp:12-177).

Setup runs on the host over the global matrix (TPU-first split: irregular
graph algorithms at setup time on host, static padded device plans for the
jitted solve phase — see raptor_tpu.multilevel.device_hierarchy). Given the
same weights, the reference's parallel setup reproduces these results.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.types import (
    CFState, CoarsenType, InterpType, RelaxType, StrengthType)
from raptor_tpu.multilevel.level import Level
from raptor_tpu.ruge_stuben import cf_splitting as cf
from raptor_tpu.ruge_stuben.interpolation import par_interpolation
from raptor_tpu.ruge_stuben.strength import strength
from raptor_tpu.utils.glibc_rand import form_rand_weights


_TPU_PROBE: Optional[bool] = None


def _tpu_backend_alive() -> bool:
    """Is a REAL TPU reachable? jax.devices() on the axon backend HANGS
    (not raises) when the relay is down, so before the first in-process
    backend init the probe goes through a subprocess with a hard
    timeout. Once a backend exists in-process, jax.devices() is safe."""
    global _TPU_PROBE
    if _TPU_PROBE is not None:
        return _TPU_PROBE
    import jax
    from jax._src import xla_bridge as xb
    if xb._backends:  # already initialized: cheap and safe
        _TPU_PROBE = jax.devices()[0].platform == "tpu"
        return _TPU_PROBE
    # The process explicitly pinned itself to a non-TPU platform
    # (tests/examples do jax.config.update("jax_platforms", "cpu")): no
    # TPU will ever be used here, so don't pay the subprocess probe —
    # with the relay down it burns the full timeout PER PROCESS (this
    # once masqueraded as a 120 s "RAP regression" in setup timings).
    plats = getattr(jax.config, "jax_platforms", None) or ""
    if plats and "tpu" not in plats and "axon" not in plats:
        _TPU_PROBE = False
        return False
    import subprocess
    import sys
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices();"
             "import sys; sys.exit(0 if d[0].platform == 'tpu' else 3)"],
            timeout=int(os.environ.get("RAPTOR_TPU_PROBE_TIMEOUT", 120)),
            capture_output=True)
        _TPU_PROBE = r.returncode == 0
    except Exception:
        _TPU_PROBE = False
    return _TPU_PROBE


def _device_rap_profitable(a: ParCSRMatrix) -> bool:
    """Auto-dispatch rule for the Galerkin engine: the device SpGEMM
    pays off only on a real TPU (the CPU 'device' is this same single
    core) and only for levels big enough to amortize relay dispatch."""
    import os
    if os.environ.get("RAPTOR_TPU_DEVRAP", "1") == "0":
        return False
    if a.nnz < int(os.environ.get("RAPTOR_TPU_DEVRAP_MIN_NNZ", 2_000_000)):
        return False
    return _tpu_backend_alive()


class ParMultilevel:
    """Base hierarchy driver. Knob defaults match par_multilevel.hpp:69-94."""

    def __init__(self, strong_threshold: float = 0.0,
                 strength_type: StrengthType = StrengthType.Classical,
                 relax_type: RelaxType = RelaxType.SOR):
        self.strong_threshold = strong_threshold
        self.strength_type = strength_type
        self.relax_type = relax_type
        self.num_smooth_sweeps = 1
        self.relax_weight = 1.0
        self.max_coarse = 50
        self.max_levels = 25
        self.tap_amg = -1
        self.weights: Optional[np.ndarray] = None
        self.solve_tol = 1e-07
        self.max_iterations = 100
        self.num_variables = 1
        self.levels: List[Level] = []
        self.coarse_lu = None  # set by duplicate_coarse
        # setup-phase timers (reference track_times, par_multilevel.hpp:
        # 127-205: per-level strength/split/interp/RAP wall clock) +
        # per-level RAP throughput stats [(level, nnz_out, seconds)]
        from raptor_tpu.profiling.timers import Profiler
        self.setup_times = Profiler()
        self.rap_stats: List[tuple] = []
        # Galerkin product engine: "host" = native C++ Gustavson (f64,
        # bit-parity path), "device" = TPU SpGEMM (device/spgemm.py),
        # "auto" = device for large levels when running on a TPU.
        self.rap_mode = "auto"
        # extended+i interpolation engine, same policy space
        # (ruge_stuben/interpolation.py: _extended_dispatch)
        self.interp_mode = "auto"

    def _galerkin(self, a: ParCSRMatrix, p: ParCSRMatrix,
                  need_ap: bool = True
                  ) -> Tuple[Optional[ParCSRMatrix], ParCSRMatrix]:
        """(AP, Ac = P^T A P) through the selected engine.

        The host path is the reference-parity engine
        (util/linalg/par_matmult.cpp:79-441).  The device path computes
        both products on the TPU in f32 — the host has one core and the
        native kernel is at its measured roofline (~40 M products/s),
        while the chip streams the padded-candidate formulation at
        memory bandwidth; a ~1e-7 relative perturbation of the coarse
        operator does not change preconditioner quality (the outer
        iteration measures f64 residuals against the exact fine A)."""
        mode = getattr(self, "rap_mode", "host")
        use_dev = a.global_csr is not None and (
            mode == "device"
            or (mode == "auto" and _device_rap_profitable(a)))
        if use_dev:
            from raptor_tpu.device import spgemm as dsp
            try:
                on_tpu = _tpu_backend_alive()
                dt = np.float32 if on_tpu else None
                ap_c, ac_c, _ = dsp.rap_device(a.global_csr,
                                               p.global_csr, dtype=dt,
                                               need_ap=need_ap)
                ap = (ParCSRMatrix(ap_c,
                                   a.partition.product(p.partition))
                      if need_ap else None)
                ac = ParCSRMatrix(
                    ac_c, p.partition.transpose().product(p.partition))
                self.rap_engine_used = "device"
                return ap, ac
            except dsp.CapOverflow:
                pass    # pathological width: host engine below
            except Exception as e:                   # noqa: BLE001
                # same contract as the interp dispatches: an engine
                # choice must never abort setup. Observed live: the
                # relay's remote compile helper can be OOM-KILLED on a
                # big SpGEMM program (HTTP 500 SIGKILL) — fall back to
                # the host engine and record why.
                import warnings
                warnings.warn(f"device RAP fell back to host: "
                              f"{type(e).__name__}: {e}"[:300],
                              stacklevel=2)
        self.rap_engine_used = "host"
        ap = a.multiply(p)
        # AP->mult_T(P) = P^T (A P): native transpose-SpGEMM, already
        # canonical (sorted/deduped/dropped) — no extra canonicalize
        ac = p.mult_T_mat(ap)
        return ap, ac

    @property
    def num_levels(self) -> int:
        return len(self.levels)

    def setup(self, af: ParCSRMatrix) -> None:
        self.setup_helper(af)

    def setup_helper(self, af: ParCSRMatrix) -> None:
        """par_multilevel.hpp:120-206."""
        # keep setup's large transient buffers in the persistent heap
        # arena (first-touch page faults on fresh mmaps doubled cold
        # setups; utils/hostmem.py has the measurements)
        from raptor_tpu.utils.hostmem import pin_arena
        pin_arena()
        self.levels = [Level(A=af.copy())]
        if self.weights is None:
            # reference: per-rank srand(2448422 + first_local_row); the
            # global equivalent is the single-rank stream
            self.weights = form_rand_weights(af.global_num_rows, 0)
        # per-level phase splits (the reference's track_times counters,
        # par_multilevel.hpp:127-205): snapshot the accumulating timers
        # around each level extension
        self.setup_level_times = []
        while (self.levels[-1].A.global_num_rows > self.max_coarse
               and (self.max_levels == -1
                    or len(self.levels) < self.max_levels)):
            before = dict(self.setup_times.times)
            self.extend_hierarchy()
            self.setup_level_times.append({
                k: v - before.get(k, 0.0)
                for k, v in self.setup_times.times.items()
                if v - before.get(k, 0.0) > 0.0})
            # degenerate coarsening (all-F split -> 0 coarse rows, or a
            # stalled split -> no reduction): drop the useless level and
            # treat the current one as coarsest rather than building an
            # empty/identical operator (the reference exits instead,
            # par_ruge_stuben_solver.hpp loop guard)
            nc = self.levels[-1].A.global_num_rows
            if nc == 0 or nc >= self.levels[-2].A.global_num_rows:
                self.levels.pop()
                self.levels[-1].P = None
                break
        self.duplicate_coarse()

    def extend_hierarchy(self) -> None:
        raise NotImplementedError

    def duplicate_coarse(self) -> None:
        """Dense LU of the coarsest operator (par_multilevel.hpp:223-333);
        on device the factors are replicated to every shard."""
        import scipy.linalg
        ac = self.levels[-1].A.global_csr.to_dense()
        self.coarse_lu = scipy.linalg.lu_factor(ac)

    def print_setup_times(self) -> str:
        """Per-level setup phase splits (print_setup_times,
        par_multilevel.hpp:412-457)."""
        keys = sorted({k for d in getattr(self, "setup_level_times", [])
                       for k in d})
        lines = ["level  " + "".join(f"{k:>15s}" for k in keys)]
        for i, d in enumerate(self.setup_level_times):
            lines.append(f"{i:5d}  " + "".join(
                f"{d.get(k, 0.0):15.4f}" for k in keys))
        return "\n".join(lines)

    def print_hierarchy(self) -> str:
        """(par_multilevel.hpp:542-565)."""
        lines = ["level     rows      nnz   nnz/row"]
        for i, lvl in enumerate(self.levels):
            n = lvl.A.global_num_rows
            nnz = lvl.A.nnz
            lines.append(f"{i:5d} {n:8d} {nnz:8d} {nnz / max(1, n):9.2f}")
        return "\n".join(lines)


class ParRugeStubenSolver(ParMultilevel):
    """ruge_stuben/par_ruge_stuben_solver.hpp:12-177."""

    def __init__(self, strong_threshold: float = 0.0,
                 coarsen_type: CoarsenType = CoarsenType.RS,
                 interp_type: InterpType = InterpType.Direct,
                 strength_type: StrengthType = StrengthType.Classical,
                 relax_type: RelaxType = RelaxType.SOR):
        super().__init__(strong_threshold, strength_type, relax_type)
        self.coarsen_type = coarsen_type
        self.interp_type = interp_type
        self.interp_filter = 0.3  # only used by HMIS/PMIS + Extended
        self.variables: Optional[np.ndarray] = None

    def extend_hierarchy(self) -> None:
        """par_ruge_stuben_solver.hpp:56-177: S -> split -> P -> RAP."""
        if getattr(self, "setup_mode", "global") == "distributed":
            return self._extend_hierarchy_distributed()
        level_ctr = len(self.levels) - 1
        a = self.levels[level_ctr].A
        n = a.global_num_rows

        with self.setup_times.phase("strength"):
            s = strength(a, self.strength_type, self.strong_threshold,
                         self.num_variables, self.variables)
        w = self.weights[:n]

        ct = self.coarsen_type
        with self.setup_times.phase("cf_splitting"):
            if ct == CoarsenType.RS:
                # reference: split_rs for levels < 3, then Falgout (:76-86)
                if level_ctr < 3:
                    states = cf.split_rs_entry(s)
                else:
                    states = cf.split_falgout(s, w)
            elif ct == CoarsenType.CLJP:
                states = cf.split_cljp(s, w)
            elif ct == CoarsenType.Falgout:
                states = cf.split_falgout(s, w)
            elif ct == CoarsenType.PMIS:
                states = cf.split_pmis(s, w)
            elif ct == CoarsenType.HMIS:
                states = cf.split_hmis(s, w)
            else:
                states = cf.split_falgout(s, w)

        it = self.interp_type
        with self.setup_times.phase("interpolation"):
            if it == InterpType.Direct:
                p = par_interpolation(a, s, states, "direct")
            elif it == InterpType.ModClassical:
                p = par_interpolation(a, s, states, "mod_classical",
                                      self.num_variables, self.variables,
                                      engine=getattr(self, "interp_mode",
                                                     "host"))
            elif it == InterpType.Extended:
                from raptor_tpu.ruge_stuben.interpolation import (
                    filter_interp)
                p = par_interpolation(a, s, states, "extended",
                                      self.num_variables, self.variables,
                                      engine=getattr(self, "interp_mode",
                                                     "host"))
                # the reference filters extended+i under EVERY
                # coarsening (par_ruge_stuben_solver.hpp:121 passes
                # interp_filter unconditionally; filtering happens
                # inside par_interpolation.cpp:967)
                p = ParCSRMatrix(filter_interp(p.global_csr,
                                               self.interp_filter),
                                 p.partition)
            else:
                p = par_interpolation(a, s, states, "direct")

        self.levels[level_ctr].P = p
        if self.num_variables > 1:
            self.variables = self.variables[
                np.asarray(states) == CFState.Selected]

        with self.setup_times.phase("RAP"):
            import time as _time
            t0 = _time.perf_counter()
            ap, ac = self._galerkin(a, p)
            self.rap_stats.append(
                (level_ctr, ap.nnz + ac.nnz, _time.perf_counter() - t0))
        if getattr(self, "sparsify_tol", 0.0) > 0.0:
            # RAP sparsification (par_multilevel.hpp:639 sparsify_tol,
            # par_sparsify.cpp; arXiv:1512.04629): drop small Ac entries
            # outside the minimal pattern, folding them into the diagonal
            from raptor_tpu.linalg.sparsify import (injection_matrix,
                                                    sparsify)
            with self.setup_times.phase("sparsify"):
                i_mat = injection_matrix(np.asarray(states))
                ac = sparsify(a, p, i_mat, ap, ac, self.sparsify_tol,
                              getattr(self, "sparsify_symmetric", True))
                ac = ParCSRMatrix(ac.global_csr.canonicalize(),
                                  ac.partition)
        self.levels.append(Level(A=ac))

    def _extend_hierarchy_distributed(self) -> None:
        """Same level extension through the per-shard + transport stages
        (ruge_stuben/par_setup.py). All five coarsenings (RS/CLJP/
        Falgout/PMIS/HMIS) and all three interpolations (Direct/
        ModClassical/Extended) run distributed; RS follows the
        reference's RS-below-level-3-then-Falgout rule with the
        distributed hybrids."""
        from raptor_tpu.core.partition import Partition
        from raptor_tpu.ruge_stuben import par_setup as ps

        level_ctr = len(self.levels) - 1
        a = self.levels[level_ctr].A
        n = a.global_num_rows
        w = self.weights[:n]

        assert self.strength_type == StrengthType.Classical, \
            "distributed setup: classical strength only (for now)"
        masks = ps.dist_classical_strength(
            a, self.strong_threshold, self.num_variables, self.variables)
        s = ps.strength_masks_to_par(a, masks)

        ct = self.coarsen_type
        if ct == CoarsenType.RS:
            # reference: split_rs for levels < 3, then Falgout (:76-86);
            # the per-shard analog of split_rs is the Falgout hybrid
            # (interior RS + boundary CLJP)
            states = ps.dist_split_falgout(s, w)
        elif ct == CoarsenType.CLJP:
            states = ps.dist_split_cljp(s, w)
        elif ct == CoarsenType.Falgout:
            states = ps.dist_split_falgout(s, w)
        elif ct == CoarsenType.PMIS:
            states = ps.dist_split_pmis(s, w)
        elif ct == CoarsenType.HMIS:
            states = ps.dist_split_hmis(s, w)
        else:
            raise ValueError(f"unknown coarsen type {ct}")

        it = self.interp_type
        if it == InterpType.Direct:
            pg = ps.dist_direct_interpolation(a, masks, states)
        elif it == InterpType.ModClassical:
            pg = ps.dist_mod_classical_interpolation(a, s, states)
        elif it == InterpType.Extended:
            pg = ps.dist_extended_interpolation(a, s, states)
        else:
            raise ValueError(f"unknown interp type {it}")
        if it == InterpType.Extended:
            # every coarsening filters extended+i (see the global-mode
            # dispatch above)
            from raptor_tpu.ruge_stuben.interpolation import filter_interp
            pg = filter_interp(pg, self.interp_filter)

        # P inherits A's row partition; coarse cols owned where their
        # C-points live (par_interpolation.cpp partition rule)
        row_bounds = a.partition.row_bounds
        sel = np.asarray(states) == CFState.Selected
        csum = np.concatenate([[0], np.cumsum(sel)])
        col_bounds = csum[row_bounds].astype(np.int64)
        part_p = Partition(a.global_num_rows, pg.n_cols,
                           a.partition.n_shards, row_bounds, col_bounds)
        p = ParCSRMatrix(pg, part_p)
        self.levels[level_ctr].P = p
        if self.num_variables > 1:
            self.variables = self.variables[sel]

        with self.setup_times.phase("RAP"):
            import time as _time
            t0 = _time.perf_counter()
            ac = ps.dist_rap(a, pg, coarse_bounds=col_bounds)
            self.rap_stats.append(
                (level_ctr, ac.nnz, _time.perf_counter() - t0))
        part_c = Partition(pg.n_cols, pg.n_cols, a.partition.n_shards,
                           col_bounds, col_bounds)
        self.levels.append(Level(A=ParCSRMatrix(ac.canonicalize(),
                                                part_c)))
