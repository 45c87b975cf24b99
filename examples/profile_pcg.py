"""PCG per-phase time splits — the reference's comm_t/precond_t
out-params (krylov/par_cg.cpp:121-239; examples/benchmark_pcg.cpp
reporting), measured by chained component timing.

Run: python examples/profile_pcg.py [grid_n] [n_shards]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.krylov.cg import cg
from raptor_tpu.krylov.profile import pcg_time_split
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_shards = (int(sys.argv[2]) if len(sys.argv) > 2
                else len(jax.devices()))

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         n_shards)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.Chebyshev)
    ml.num_smooth_sweeps = 3
    ml.setup(A)
    mesh = dpar.make_mesh(n_shards)
    dh = DeviceHierarchy(ml, mesh, dtype=jnp.float32)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float32,
                                need_transpose=False)
    b = A.mult(np.ones(A.global_num_rows))
    bv = dpar.device_put_vector(b, A.partition.row_bounds, dA.rows_pad,
                                mesh, dtype=jnp.float32)

    split = pcg_time_split(mesh, dA, bv, precond=dh.precond_pack())
    tot = split["total_t"]
    print(f"{n}x{n}, {n_shards} shards — per PCG iteration:")
    for k in ("total_t", "precond_t", "spmv_t", "comm_t"):
        frac = split[k] / tot if tot else 0.0
        print(f"  {k:10s} {split[k] * 1e6:10.1f} us  ({100 * frac:5.1f}%)")

    x0 = dpar.device_put_vector(np.zeros_like(b),
                                A.partition.row_bounds, dA.rows_pad,
                                mesh, dtype=jnp.float32)
    t0 = time.perf_counter()
    r = cg(mesh, dA, x0, bv, tol=1e-5, max_iter=100,
           precond=dh.precond_pack())
    it = int(r.n_iters)
    print(f"PCG: {it} iters to {float(r.res[it]):.2e} "
          f"({time.perf_counter() - t0:.2f}s incl compile)")


if __name__ == "__main__":
    main()
