"""Node-aware vs flat SETUP-phase communication (the reference's
benchmark_tap_spgemm.cpp / profile_tap_spgemm analog: matrix-row
communication staged through the 2-step tap_mat_comm schedule,
core/comm_pkg.hpp:1392-1451).

Runs the whole distributed RS setup (strength -> split -> interpolation
-> RAP, every stage exchanging rows/halos through the transport) in
REAL OS processes twice — flat all-to-all vs TapGroup staging — and
reports wall time plus inter-node message counts.

Run: python examples/benchmark_tap_setup.py [grid_n] [world] [ppn]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from raptor_tpu.comm.multiproc import (MultiProcessTransport,
                                       ProcessGroup, run_spmd)
from raptor_tpu.comm.tapgroup import TapGroup
from raptor_tpu.core.par_matrix import ParCSRMatrix, par_matrix_from_scipy
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, stencil_grid
from raptor_tpu.utils.glibc_rand import form_rand_weights


class CountingGroup(ProcessGroup):
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

    base = CountingGroup(group_raw.rank, group_raw.world,
                         group_raw.inboxes, ppn)
    group = TapGroup(base, ppn) if tap else base
    a = ParCSRMatrix.from_local_rows([blocks[rank]], part,
                                     first_shard=rank)
    t0 = time.perf_counter()
    h = spmd_rs_setup(a, w, lambda m: MultiProcessTransport(group, m),
                      coarsen=CoarsenType.HMIS,
                      interp=InterpType.Extended)
    dt = time.perf_counter() - t0
    return dt, base.inter_sends, h.num_levels


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    world = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    ppn = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    A = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n))
    Ap = par_matrix_from_scipy(A.to_scipy(), world)
    w = form_rand_weights(Ap.global_num_rows, 0)
    part = Ap.partition
    blocks = [blk.global_cols_csr(part.global_num_cols)
              for blk in Ap.shards()]

    for tap in (False, True):
        res = run_spmd(world, _worker, blocks, part, w, ppn, tap)
        label = "TAP (2-step)" if tap else "flat"
        print(f"{label:>13}: setup max {max(r[0] for r in res):.2f}s, "
              f"inter-node sends {sum(r[1] for r in res)}, "
              f"{res[0][2]} levels "
              f"({world} procs = {world // ppn} nodes x {ppn} PPN)")


if __name__ == "__main__":
    main()
