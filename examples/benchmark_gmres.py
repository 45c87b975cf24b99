"""GMRES(m) vs AMG-preconditioned GMRES on a nonsymmetric
convection-diffusion operator (beyond-reference breadth — the
reference's Krylov layer stops at CG/BiCGStab; see krylov/gmres.py).

Run: python examples/benchmark_gmres.py [grid_n] [n_shards] [restart]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np

import jax

import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import par_stencil_grid
from raptor_tpu.krylov.gmres import gmres
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    restart = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    # upwind convection-diffusion: nonsymmetric, diagonally dominant
    st = np.array([[0.0, -1.0, 0.0],
                   [-1.8, 5.0, -0.2],
                   [0.0, -1.0, 0.0]])
    A = par_stencil_grid(st, (n, n), n_shards)
    bh = A.mult(np.ones(A.global_num_rows))

    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    x = dpar.device_put_vector(np.zeros_like(bh),
                               A.partition.row_bounds, dA.rows_pad, mesh)
    b = dpar.device_put_vector(bh, A.partition.row_bounds, dA.rows_pad,
                               mesh)

    r = gmres(mesh, dA, x, b, tol=1e-8, restart=restart, max_iter=500)   # compile
    t0 = time.perf_counter()
    r = gmres(mesh, dA, x, b, tol=1e-8, restart=restart, max_iter=500)
    t_plain = time.perf_counter() - t0
    print(f"GMRES({restart}): {int(r.n_iters)} iters {t_plain:.3f}s "
          f"rel resid {float(r.res[int(r.n_iters)]):.3e}")

    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.SOR)
    t0 = time.perf_counter()
    ml.setup(A)
    t_setup = time.perf_counter() - t0
    dh = DeviceHierarchy(ml, mesh)
    pk = dh.precond_pack()
    rp = gmres(mesh, dA, x, b, tol=1e-8, restart=restart, precond=pk)
    t0 = time.perf_counter()
    rp = gmres(mesh, dA, x, b, tol=1e-8, restart=restart, precond=pk)
    t_pre = time.perf_counter() - t0
    print(f"AMG-GMRES: {int(rp.n_iters)} iters {t_pre:.3f}s "
          f"(+{t_setup:.2f}s setup) "
          f"rel resid {float(rp.res[int(rp.n_iters)]):.3e}")

    xh = dpar.host_vector(rp.x, A.partition.row_bounds)
    print("true rel resid:",
          np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh))


if __name__ == "__main__":
    main()
