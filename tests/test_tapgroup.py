"""Node-aware setup transport (TapGroup): the 2-step tap_mat_comm
equivalent (core/comm_pkg.hpp:1392-1451) under the setup-phase
Transport. Results must be bit-identical to the flat schedule; the
inter-node message count must shrink toward O(nodes^2)."""

import numpy as np
import pytest

from raptor_tpu.comm.multiproc import (MultiProcessTransport,
                                       ProcessGroup, run_spmd)
from raptor_tpu.comm.tapgroup import TapGroup
from raptor_tpu.core.par_matrix import ParCSRMatrix, par_matrix_from_scipy
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, stencil_grid
from raptor_tpu.utils.glibc_rand import form_rand_weights


class CountingGroup(ProcessGroup):
    """Flat group that counts inter-node P2P sends (for the baseline)."""

    def __init__(self, rank, world, inboxes, ppn):
        super().__init__(rank, world, inboxes)
        self.ppn = ppn
        self.inter_sends = 0

    def send(self, dst, tag, payload):
        if dst // self.ppn != self.rank // self.ppn and dst != self.rank:
            self.inter_sends += 1
        super().send(dst, tag, payload)


def _worker(rank, group_raw, blocks, part, w, ppn, tap):
    from raptor_tpu.comm.spmd import spmd_rs_setup
    from raptor_tpu.core.types import CoarsenType, InterpType

    group = (TapGroup(CountingGroup(group_raw.rank, group_raw.world,
                                    group_raw.inboxes, ppn), ppn)
             if tap else
             CountingGroup(group_raw.rank, group_raw.world,
                           group_raw.inboxes, ppn))
    a = ParCSRMatrix.from_local_rows([blocks[rank]], part,
                                     first_shard=rank)
    h = spmd_rs_setup(a, w, lambda m: MultiProcessTransport(group, m),
                      coarsen=CoarsenType.HMIS,
                      interp=InterpType.Extended)
    out = []
    for lvl in h.levels:
        blk = lvl.a_local.shards()[0]
        out.append(blk.global_cols_csr(
            lvl.a_local.partition.global_num_cols))
    inter = (group.inter_sends if not tap
             else group.base.inter_sends)
    return out, inter


def _stage_worker(rank, group_raw, blocks, part, w, ppn, tap):
    """One level of the distributed RS pipeline, stage by stage, so each
    stage's output can be compared flat-vs-TAP independently (the
    reference's per-stage tap test matrix: test_tap_splitting.cpp,
    test_tap_interpolation.cpp, test_tap_rap.cpp)."""
    from raptor_tpu.comm.multiproc import MultiProcessTransport
    from raptor_tpu.ruge_stuben import par_setup as ps

    group = (TapGroup(group_raw, ppn) if tap else group_raw)
    a = ParCSRMatrix.from_local_rows([blocks[rank]], part,
                                     first_shard=rank)
    tr = MultiProcessTransport(group, a)
    masks = ps.dist_classical_strength(a, 0.25, tr=tr)
    s = ps.strength_masks_to_par(a, masks)
    states = np.asarray(ps.dist_split_pmis(
        s, w, tr=MultiProcessTransport(group, s)))
    p_blocks, n_coarse = ps.dist_extended_interpolation(
        a, s, states, tr=tr, assemble=False)
    from raptor_tpu.comm.spmd import _coarse_bounds
    cb = _coarse_bounds(states, part.row_bounds)
    c_blocks = ps.dist_rap(a, p_blocks, tr=tr, coarse_bounds=cb,
                           assemble=False)
    ser = lambda b: (b.indptr, b.indices, b.data)     # noqa: E731
    return {
        "masks": [np.asarray(m) for pair in masks for m in pair],
        "states": states,
        "P": [ser(b) for b in p_blocks],
        "Ac": [ser(b) for b in c_blocks],
    }


@pytest.mark.parametrize("world,ppn", [(4, 2), (6, 3)])
def test_tapgroup_per_stage(world, ppn):
    """Every setup stage — strength, PMIS splitting, extended+i
    interpolation, RAP — is bit-identical under the node-aware schedule
    at both mesh aspect ratios."""
    A = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (20, 20))
    Ap = par_matrix_from_scipy(A.to_scipy(), world)
    w = form_rand_weights(Ap.global_num_rows, 0)
    part = Ap.partition
    ncols = part.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in Ap.shards()]

    flat = run_spmd(world, _stage_worker, blocks, part, w, ppn, False)
    tap = run_spmd(world, _stage_worker, blocks, part, w, ppn, True)
    for r in range(world):
        f, t = flat[r], tap[r]
        np.testing.assert_array_equal(f["states"], t["states"])
        for mf, mt in zip(f["masks"], t["masks"]):
            np.testing.assert_array_equal(mf, mt)
        for key in ("P", "Ac"):
            assert len(f[key]) == len(t[key])
            for bf, bt in zip(f[key], t[key]):
                for af, at in zip(bf, bt):
                    np.testing.assert_array_equal(af, at)


def _hier_worker(rank, group_raw, blocks, part, w, ppn, tap):
    """Whole-hierarchy worker returning serialized levels + send
    counters (corner-case meshes reuse it)."""
    from raptor_tpu.comm.spmd import spmd_rs_setup
    from raptor_tpu.core.types import CoarsenType, InterpType

    group = (TapGroup(group_raw, ppn) if tap else group_raw)
    a = ParCSRMatrix.from_local_rows([blocks[rank]], part,
                                     first_shard=rank)
    h = spmd_rs_setup(a, w, lambda m: MultiProcessTransport(group, m),
                      coarsen=CoarsenType.PMIS,
                      interp=InterpType.ModClassical)
    out = []
    for lvl in h.levels:
        blk = lvl.a_local.shards()[0]
        g = blk.global_cols_csr(lvl.a_local.partition.global_num_cols)
        out.append((g.indptr, g.indices, g.data))
    inter = getattr(group, "inter_sends", 0)
    return out, inter


def _assert_equal_hierarchies(flat, tap, world):
    for r in range(world):
        assert len(tap[r][0]) == len(flat[r][0])
        for lf, lt in zip(flat[r][0], tap[r][0]):
            for af, at in zip(lf, lt):
                np.testing.assert_array_equal(af, at)


def test_tapgroup_single_node():
    """world == ppn: one node, no inter-node traffic at all — the G step
    must never fire and results stay bit-identical (reference: TAPComm
    on one node degenerates to local_L_par_comm only)."""
    A = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (16, 16))
    world = 4
    Ap = par_matrix_from_scipy(A.to_scipy(), world)
    w = form_rand_weights(Ap.global_num_rows, 0)
    ncols = Ap.partition.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in Ap.shards()]
    flat = run_spmd(world, _hier_worker, blocks, Ap.partition, w, 4,
                    False)
    tap = run_spmd(world, _hier_worker, blocks, Ap.partition, w, 4, True)
    _assert_equal_hierarchies(flat, tap, world)
    assert all(t[1] == 0 for t in tap)   # zero inter-node sends


def test_tapgroup_ppn1():
    """ppn == 1: every rank is its own node — the schedule degenerates
    to the flat exchange (self-aggregation) and must stay exact."""
    A = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (16, 16))
    world = 4
    Ap = par_matrix_from_scipy(A.to_scipy(), world)
    w = form_rand_weights(Ap.global_num_rows, 0)
    ncols = Ap.partition.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in Ap.shards()]
    flat = run_spmd(world, _hier_worker, blocks, Ap.partition, w, 1,
                    False)
    tap = run_spmd(world, _hier_worker, blocks, Ap.partition, w, 1, True)
    _assert_equal_hierarchies(flat, tap, world)
    assert all(t[1] > 0 for t in tap)    # everything crosses "nodes"


def test_tapgroup_empty_pairs():
    """Disconnected operator: half the rank pairs (and one whole node
    pair) exchange nothing — empty bundles must flow through the
    aggregate/distribute steps without deadlock or corruption."""
    import scipy.sparse as sp
    g = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                     (12, 12)).to_scipy()
    A2 = sp.block_diag([g, g]).tocsr()    # two disconnected components
    world, ppn = 4, 2                      # ranks 0-1 comp A, 2-3 comp B
    Ap = par_matrix_from_scipy(A2, world)
    w = form_rand_weights(Ap.global_num_rows, 0)
    ncols = Ap.partition.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in Ap.shards()]
    flat = run_spmd(world, _hier_worker, blocks, Ap.partition, w, ppn,
                    False)
    tap = run_spmd(world, _hier_worker, blocks, Ap.partition, w, ppn,
                   True)
    _assert_equal_hierarchies(flat, tap, world)


@pytest.mark.parametrize("world,ppn", [(4, 2), (8, 4)])
def test_tap_setup_transport(world, ppn):
    A = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24))
    Ap = par_matrix_from_scipy(A.to_scipy(), world)
    w = form_rand_weights(Ap.global_num_rows, 0)
    part = Ap.partition
    ncols = part.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in Ap.shards()]

    flat = run_spmd(world, _worker, blocks, part, w, ppn, False)
    tap = run_spmd(world, _worker, blocks, part, w, ppn, True)

    # identical hierarchies, rank by rank, level by level
    for r in range(world):
        assert len(tap[r][0]) == len(flat[r][0])
        for lf, lt in zip(flat[r][0], tap[r][0]):
            assert np.array_equal(lf.indptr, lt.indptr)
            assert np.array_equal(lf.indices, lt.indices)
            np.testing.assert_allclose(lf.data, lt.data, rtol=0, atol=0)

    inter_flat = sum(f[1] for f in flat)
    inter_tap = sum(t[1] for t in tap)
    assert inter_tap < inter_flat, (inter_tap, inter_flat)
