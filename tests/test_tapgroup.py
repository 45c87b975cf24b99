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
