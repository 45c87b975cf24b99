"""Smoothed-aggregation AMG benchmark (profile_tap_sas.cpp /
aggregation examples equivalent): SA setup + device V-cycle solve on the
27-pt Laplacian.

Run: python examples/benchmark_sa.py [grid_n] [n_shards] [f32|f64]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np

import jax

# honor JAX_PLATFORMS=cpu for mesh dry-runs (the TPU plugin's
# sitecustomize force-sets the platform list)
import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raptor_tpu.aggregation.solver import ParSmoothedAggregationSolver
from raptor_tpu.core.types import RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import laplace_stencil_27pt, par_stencil_grid
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    if len(sys.argv) > 3 and sys.argv[3] == "f64":
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        dtype = jnp.float32

    A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), n_shards)
    bh = A.mult(np.ones(A.global_num_rows))

    ml = ParSmoothedAggregationSolver(strong_threshold=0.0,
                                      relax_type=RelaxType.Chebyshev)
    ml.num_smooth_sweeps = 2
    if dtype == jnp.float32:
        ml.solve_tol = 1e-5
    t0 = time.perf_counter()
    ml.setup(A)
    t_setup = time.perf_counter() - t0
    print(ml.print_hierarchy())

    mesh = dpar.make_mesh(n_shards)
    t0 = time.perf_counter()
    dh = DeviceHierarchy(ml, mesh, dtype=dtype)
    t_plan = time.perf_counter() - t0

    x0, b = dh.vector(np.zeros_like(bh)), dh.vector(bh)
    r = dh.solve(x0, b)                        # compile
    int(r.n_iters)
    t0 = time.perf_counter()
    r = dh.solve(x0, b)
    iters = int(r.n_iters)
    t_solve = time.perf_counter() - t0

    print(f"SA setup {t_setup:.2f}s, plans {t_plan:.2f}s; "
          f"{iters} V-cycles in {t_solve:.3f}s "
          f"-> {t_solve / max(1, iters) * 1e3:.2f} ms/cycle; "
          f"rel resid {float(r.res[iters]):.3e}")


if __name__ == "__main__":
    main()
