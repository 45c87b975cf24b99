"""Blocked (BSR) AMG on plane-stress elasticity: setup -> blocked
V-cycle -> BSR-preconditioned PCG (BASELINE config 5; the reference's
ParBSR path, core/par_matrix.hpp:613-699).

Run: python examples/benchmark_bsr_amg.py [nx] [ny] [n_shards]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

# honor JAX_PLATFORMS=cpu even when the TPU plugin's sitecustomize
# force-registered another platform
import os
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # f64 Krylov loop

import jax.numpy as jnp

from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.fem import par_fem
from raptor_tpu.krylov.cg import cg
from raptor_tpu.multilevel.bsr_hierarchy import (BSRDeviceHierarchy,
                                                 ParBSRRugeStubenSolver)


def main():
    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ny = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    A, _ = par_fem("elasticity", nx, ny, n_shards)
    print(f"elasticity {nx}x{ny}: {A.global_num_rows} dofs, "
          f"{A.nnz} nnz")

    ml = ParBSRRugeStubenSolver(2, strong_threshold=0.25)
    t0 = time.perf_counter()
    ml.setup(A)
    print(f"setup {time.perf_counter() - t0:.2f}s, "
          f"levels {[lvl.A.global_num_rows for lvl in ml.levels]}")

    mesh = dpar.make_mesh(n_shards)
    dh = BSRDeviceHierarchy(ml, mesh, sweeps=3)
    b = A.mult(np.ones(A.global_num_rows))

    t0 = time.perf_counter()
    x, hist, k = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b),
                          tol=1e-6, max_iter=100)
    hist = hist[hist >= 0]
    print(f"blocked V-cycle: {k} iters to {hist[-1]:.2e} "
          f"({time.perf_counter() - t0:.2f}s incl compile)")

    Ab = ml.levels[0].A
    dA = dpar.device_put_matrix(Ab, mesh, dtype=jnp.float64,
                                need_transpose=False)
    bb = dpar.device_put_vector(b, Ab.partition.row_bounds, dA.rows_pad,
                                mesh)
    x0 = dpar.device_put_vector(np.zeros_like(b),
                                Ab.partition.row_bounds, dA.rows_pad,
                                mesh)
    t0 = time.perf_counter()
    r = cg(mesh, dA, x0, bb, tol=1e-10, max_iter=200,
           precond=dh.precond_pack())
    it = int(r.n_iters)
    print(f"BSR-PCG: {it} iters to {float(r.res[it]):.2e} "
          f"({time.perf_counter() - t0:.2f}s incl compile)")


if __name__ == "__main__":
    main()
