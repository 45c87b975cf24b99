"""Setup + solve wall-time benchmark over the reference's system
selector (examples/benchmark_solve.cpp equivalent: system 0 = 3-D 27pt
Laplacian, 1 = 2-D rotated anisotropic diffusion, 3 = MatrixMarket
file; RS + Direct + Classical + SOR, theta = 0.25, b = A @ rand(x)).

The reference clears the L2 cache between phases and reports
raptor_setup / raptor_solve seconds; here each phase is timed the same
way (the TPU has no host-visible cache to clear — the device plans are
rebuilt per run, which is the cold path).

Run: python examples/benchmark_solve.py [system] [n|file] [eps] [theta]
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
jax.config.update("jax_enable_x64", True)

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.io import read_par_mm
from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                         laplace_stencil_27pt,
                                         par_stencil_grid)
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    system = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_shards = len(jax.devices())

    if system == 0:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
        A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), n_shards)
    elif system == 1:
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
        eps = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
        theta = float(sys.argv[4]) if len(sys.argv) > 4 else np.pi / 4
        A = par_stencil_grid(diffusion_stencil_2d(eps, theta), (n, n),
                             n_shards)
    else:
        path = (sys.argv[2] if len(sys.argv) > 2
                else "/root/reference/examples/LFAT5.mtx")
        A = read_par_mm(path, n_shards)

    # b = A x_rand (benchmark_solve.cpp: x.set_rand_values(); A->mult)
    rng = np.random.default_rng(0)
    x_true = rng.random(A.global_num_cols)
    b = A.mult(x_true)

    t0 = time.perf_counter()
    ml = ParRugeStubenSolver(0.25, CoarsenType.RS, InterpType.Direct,
                             relax_type=RelaxType.SOR)
    ml.setup(A)
    raptor_setup = time.perf_counter() - t0
    print(ml.print_hierarchy())

    mesh = dpar.make_mesh(n_shards)
    t0 = time.perf_counter()
    dh = DeviceHierarchy(ml, mesh)
    plans = time.perf_counter() - t0

    x0 = dh.vector(np.zeros_like(b))
    bd = dh.vector(b)
    r = dh.solve(x0, bd)          # compile + first solve
    float(r.res[0])
    t0 = time.perf_counter()
    r = dh.solve(x0, bd)
    iters = int(r.n_iters)
    raptor_solve = time.perf_counter() - t0

    print(f"raptor_setup {raptor_setup:.4f}s  (device plans +{plans:.4f}s)")
    print(f"raptor_solve {raptor_solve:.4f}s  ({iters} V-cycles, rel resid "
          f"{float(r.res[iters]):.3e})")


if __name__ == "__main__":
    main()
