"""Smoothed-aggregation setup sweep: prolongation smoothing steps 0-3,
plain vs topology-aware comm (examples/benchmark_setup_sweeps.cpp
equivalent).

For each ``prolong_smooth_steps`` the driver builds the SA hierarchy,
reports setup time + hierarchy shape + operator complexity, then runs
the device solve to 1e-7 twice — with the flat halo exchange and with
the TAP 3-step schedule on the (hosts x local) mesh — and prints solve
time and iteration count for both.

Run: python examples/benchmark_setup_sweeps.py [grid_n] [hosts] [local]
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

from raptor_tpu.aggregation.solver import ParSmoothedAggregationSolver
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         H * L)
    rng = np.random.default_rng(1)
    xr = rng.random(A.global_num_rows)
    b = A.mult(xr)

    mesh2 = dpar.make_mesh2(H, L)
    for steps in range(4):
        print(f"\n== prolongation sweeps: {steps} ==")
        ml = ParSmoothedAggregationSolver(0.0,
                                          prolong_smooth_steps=steps)
        ml.solve_tol = 1e-7
        ml.max_iterations = 1000
        t0 = time.perf_counter()
        ml.setup(A)
        print(f"setup {time.perf_counter() - t0:.2f} s, "
              f"{len(ml.levels)} levels, op complexity "
              f"{sum(l.A.nnz for l in ml.levels) / A.nnz:.2f}")

        for tap, label in ((-1, "flat"), (0, "TAP")):
            ml.tap_amg = tap
            dh = DeviceHierarchy(ml, mesh2)
            x0 = dh.vector(np.zeros_like(b))
            bd = dh.vector(b)
            res = dh.solve(x0, bd)     # compile + first solve
            t0 = time.perf_counter()
            res = dh.solve(x0, bd)
            dt = time.perf_counter() - t0
            print(f"  {label:5s}: {int(res.n_iters):3d} iters, "
                  f"{dt:.3f} s warm")


if __name__ == "__main__":
    main()
