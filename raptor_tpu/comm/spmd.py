"""Whole-hierarchy SPMD AMG setup: every rank builds its LOCAL slice of
every level, no global matrix on any process.

This is the complete per-rank equivalent of
``ParRugeStubenSolver::setup`` (ruge_stuben/par_ruge_stuben_solver.hpp:
32-177 over MPI): strength -> CF split -> interpolation -> Galerkin RAP,
looped to the coarsest level, entirely over ``Transport`` collectives.
Runs identically over the in-process transport (validation) and
``MultiProcessTransport`` (real OS processes). Only O(global_n) vectors
(CF states, weights) are replicated per rank — like the reference's
per-rank states arrays; matrices stay distributed throughout.

The coarsest operator (<= max_coarse rows) is allgathered and LU-factored
redundantly on every rank (duplicate_coarse, par_multilevel.hpp:223-333).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.core.types import CFState, CoarsenType, InterpType


@dataclasses.dataclass
class SpmdLevel:
    """One rank's slice of one hierarchy level."""

    a_local: ParCSRMatrix            # local view
    p_blocks: Optional[List[CSRMatrix]]  # this rank's P row blocks
                                         # (global cols), one per local shard
    states: Optional[np.ndarray]     # replicated CF states of this level

    @property
    def p_block(self) -> Optional[CSRMatrix]:
        return None if self.p_blocks is None else self.p_blocks[0]


@dataclasses.dataclass
class SpmdHierarchy:
    levels: List[SpmdLevel]
    coarse_lu: tuple                 # replicated (lu, piv)

    @property
    def num_levels(self) -> int:
        return len(self.levels)


def _coarse_bounds(states: np.ndarray, row_bounds) -> np.ndarray:
    sel = np.asarray(states) == CFState.Selected
    csum = np.concatenate([[0], np.cumsum(sel)])
    return csum[np.asarray(row_bounds)].astype(np.int64)


def spmd_rs_setup(a_local: ParCSRMatrix, weights: np.ndarray,
                  make_transport,
                  coarsen: CoarsenType = CoarsenType.HMIS,
                  interp: InterpType = InterpType.Extended,
                  theta: float = 0.25, interp_filter: float = 0.3,
                  max_coarse: int = 50,
                  max_levels: int = 25) -> SpmdHierarchy:
    """Build the whole RS hierarchy rank-locally.

    ``a_local``: this rank's local-view fine matrix.
    ``weights``: replicated random weights (glibc stream / weights.txt).
    ``make_transport(matrix) -> Transport``: factory binding the rank's
    communication context (e.g. ``lambda m: MultiProcessTransport(group,
    m)``; ``InProcessTransport`` for validation).
    """
    from raptor_tpu.ruge_stuben import par_setup as ps
    from raptor_tpu.ruge_stuben.interpolation import filter_interp

    levels: List[SpmdLevel] = []
    a = a_local
    for _ in range(max_levels - 1):
        n = a.global_num_rows
        if n <= max_coarse:
            break
        w = weights[:n]
        tr = make_transport(a)
        masks = ps.dist_classical_strength(a, theta, tr=tr)
        s = ps.strength_masks_to_par(a, masks)
        tr_s = make_transport(s)

        if coarsen == CoarsenType.CLJP:
            states = ps.dist_split_cljp(s, w, tr=tr_s)
        elif coarsen == CoarsenType.PMIS:
            states = ps.dist_split_pmis(s, w, tr=tr_s)
        elif coarsen in (CoarsenType.Falgout, CoarsenType.RS):
            states = ps.dist_split_falgout(s, w, tr=tr_s)
        else:
            states = ps.dist_split_hmis(s, w, tr=tr_s)
        states = np.asarray(states)

        if interp == InterpType.Direct:
            p_blocks, n_coarse = ps.dist_direct_interpolation(
                a, masks, states, tr=tr, assemble=False)
        elif interp == InterpType.ModClassical:
            p_blocks, n_coarse = ps.dist_mod_classical_interpolation(
                a, s, states, tr=tr, assemble=False)
        else:
            p_blocks, n_coarse = ps.dist_extended_interpolation(
                a, s, states, tr=tr, assemble=False)
            # the reference filters extended+i under every coarsening
            # (par_ruge_stuben_solver.hpp:121); row-local truncation +
            # row-sum rescale per rank
            p_blocks = [filter_interp(pb, interp_filter)
                        for pb in p_blocks]

        part = a.partition
        cb = _coarse_bounds(states, part.row_bounds)
        c_blocks = ps.dist_rap(a, p_blocks, tr=tr, coarse_bounds=cb,
                               assemble=False)
        levels.append(SpmdLevel(a, p_blocks, states))

        part_c = Partition(n_coarse, n_coarse, part.n_shards, cb, cb)
        a = ParCSRMatrix.from_local_rows(c_blocks, part_c,
                                         first_shard=a.first_shard)

    # redundant coarse LU: allgather the (small) coarsest rows
    import scipy.linalg
    tr = make_transport(a)
    ncols = a.partition.global_num_cols
    flats = [np.asarray(blk.global_cols_csr(ncols).to_scipy().todense())
             .reshape(-1) for blk in a.shards()]
    full = tr.allgather_concat(flats)
    ac = full.reshape(a.global_num_rows, ncols)
    coarse_lu = scipy.linalg.lu_factor(ac)
    levels.append(SpmdLevel(a, None, None))
    return SpmdHierarchy(levels, coarse_lu)


def spmd_bsr_setup(a_local: ParCSRMatrix, block_size: int,
                   weights: np.ndarray, make_transport,
                   coarsen: CoarsenType = CoarsenType.CLJP,
                   interp: InterpType = InterpType.ModClassical,
                   theta: float = 0.25, max_coarse: int = 50,
                   max_levels: int = 25,
                   strength_type=None) -> SpmdHierarchy:
    """Whole-hierarchy BLOCKED (BSR) setup per rank: nodal condensation
    on the block-norm graph, nodal CF split, per-component
    interpolation, blocked Galerkin RAP — every stage over the
    Transport seam with per-rank row blocks only (the reference's
    ParBSRMatrix + block_size comm path, core/par_matrix.hpp:613-699,
    run as component-scalar exchanges). ``a_local``'s partition must be
    block-aligned (multilevel.bsr_hierarchy.block_partition)."""
    from raptor_tpu.multilevel.bsr_hierarchy import bsr_extend_distributed

    b = int(block_size)
    levels: List[SpmdLevel] = []
    a = a_local
    for _ in range(max_levels - 1):
        if a.global_num_rows // b <= max_coarse:
            break
        p_blocks, _p_comps, states, c_blocks, part_c = \
            bsr_extend_distributed(a, b, weights, coarsen, interp,
                                   theta, make_transport,
                                   strength_type=strength_type)
        levels.append(SpmdLevel(a, p_blocks, states))
        a = ParCSRMatrix.from_local_rows(c_blocks, part_c,
                                         first_shard=a.first_shard)

    import scipy.linalg
    tr = make_transport(a)
    ncols = a.partition.global_num_cols
    flats = [np.asarray(blk.global_cols_csr(ncols).to_scipy().todense())
             .reshape(-1) for blk in a.shards()]
    full = tr.allgather_concat(flats)
    ac = full.reshape(a.global_num_rows, ncols)
    coarse_lu = scipy.linalg.lu_factor(ac)
    levels.append(SpmdLevel(a, None, None))
    return SpmdHierarchy(levels, coarse_lu)


def spmd_sa_setup(a_local: ParCSRMatrix, weights: np.ndarray,
                  make_transport, theta: float = 0.0,
                  prolong_weight: float = 4.0 / 3.0,
                  prolong_smooth_steps: int = 1,
                  interp_tol: float = 1e-10,
                  max_coarse: int = 50,
                  max_levels: int = 25) -> SpmdHierarchy:
    """Whole-hierarchy smoothed-aggregation setup per rank
    (aggregation/par_smoothed_aggregation_solver.hpp:14-150 over MPI):
    symmetric strength -> MIS(2) -> aggregation -> tentative candidates
    -> Jacobi-smoothed P -> RAP, looped; candidate vector R chains to the
    next level's B. Same transport contract as ``spmd_rs_setup``."""
    from raptor_tpu.ruge_stuben import par_setup as ps

    levels: List[SpmdLevel] = []
    a = a_local
    b_cand = np.ones(a.global_num_rows)
    for _ in range(max_levels - 1):
        n = a.global_num_rows
        if n <= max_coarse:
            break
        w = weights[:n]
        tr = make_transport(a)
        masks = ps.dist_symmetric_strength(a, theta, tr=tr)
        s = ps.strength_masks_to_par(a, masks)
        tr_s = make_transport(s)
        states = np.asarray(ps.dist_mis2(s, w, tr=tr_s))
        # production solver aggregates without rand tie-breaks
        # (par_smoothed_aggregation_solver.hpp:80; see aggregation/solver.py)
        n_aggs, aggs = ps.dist_aggregate(a, s, states, tr=tr_s)
        t_blocks, R = ps.dist_fit_candidates(a, n_aggs, aggs, b_cand,
                                             interp_tol, tr=tr,
                                             assemble=False)
        p_blocks = ps.dist_jacobi_prolongation(
            a, t_blocks, prolong_weight, prolong_smooth_steps, tr=tr,
            assemble=False)

        part = a.partition
        # coarse cols partitioned by root ownership (roots in row order)
        sel = states > 0
        csum = np.concatenate([[0], np.cumsum(sel)])
        cb = csum[np.asarray(part.row_bounds)].astype(np.int64)
        c_blocks = ps.dist_rap(a, p_blocks, tr=tr, coarse_bounds=cb,
                               assemble=False)
        levels.append(SpmdLevel(a, p_blocks, states))

        part_c = Partition(n_aggs, n_aggs, part.n_shards, cb, cb)
        a = ParCSRMatrix.from_local_rows(c_blocks, part_c,
                                         first_shard=a.first_shard)
        b_cand = R[:n_aggs]

    import scipy.linalg
    tr = make_transport(a)
    ncols = a.partition.global_num_cols
    flats = [np.asarray(blk.global_cols_csr(ncols).to_scipy().todense())
             .reshape(-1) for blk in a.shards()]
    full = tr.allgather_concat(flats)
    ac = full.reshape(a.global_num_rows, ncols)
    coarse_lu = scipy.linalg.lu_factor(ac)
    levels.append(SpmdLevel(a, None, None))
    return SpmdHierarchy(levels, coarse_lu)
