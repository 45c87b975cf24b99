"""Per-level communication profile of an AMG hierarchy
(examples/benchmark_matops.cpp + profile_amg.cpp equivalents).

The reference walks every hierarchy level and times the halo exchange
under different MPI protocols (benchmark_matops.cpp:400-469). On TPU the
exchange is one XLA all-to-all, so the per-level knobs are message
COUNTS/BYTES by protocol class and locality — this driver prints the
static comm model per level (short/eager/rendezvous x intra/inter-host)
plus the measured per-level SpMV + halo-exchange time on the mesh.

Run: python examples/profile_comm_levels.py [grid_n] [n_shards] [hosts]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from raptor_tpu.comm.plan import build_comm_plan
from raptor_tpu.core.types import CoarsenType, InterpType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
from raptor_tpu.profiling.comm_model import model_comm_plan


def _time_op(fn, *args, reps=20):
    fn(*args).block_until_ready()    # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    hosts = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         n_shards)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP, InterpType.ModClassical)
    ml.setup(A)
    mesh = dpar.make_mesh(n_shards)

    print(f"{'lvl':>3} {'rows':>9} {'nnz':>10} {'msgs':>5} {'interB':>10} "
          f"{'bytes':>10} {'spmv_ms':>8}")
    for i, lvl in enumerate(ml.levels):
        Al = lvl.A
        stats = model_comm_plan(build_comm_plan(Al),
                                shards_per_host=max(1, n_shards // hosts))
        dA = dpar.device_put_matrix(Al, mesh)
        x = dpar.device_put_vector(
            np.random.default_rng(i).random(Al.global_num_cols),
            Al.partition.col_bounds, dA.cols_pad, mesh)
        dt = _time_op(lambda dA=dA, x=x: dpar.spmv(mesh, dA, x))
        msgs = sum(stats.n_msgs.values())
        bts = sum(stats.n_bytes.values())
        print(f"{i:>3} {Al.global_num_rows:>9} {Al.nnz:>10} "
              f"{msgs:>5} {stats.inter_host_bytes:>10} "
              f"{bts:>10} {dt * 1e3:>8.3f}")


if __name__ == "__main__":
    main()
