"""AMG setup + solve benchmark (examples/benchmark_setup.cpp,
benchmark_solve.cpp, benchmark_amg.cpp equivalents).

Run: python examples/benchmark_amg.py [grid_n] [n_shards] [f32|f64] [relax] [sweeps]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import sys
import time

import numpy as np

import jax

# honor JAX_PLATFORMS=cpu for mesh dry-runs (the TPU plugin's
# sitecustomize force-sets the platform list)
import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
from raptor_tpu.profiling.timers import Profiler


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    dtype = jnp.float32 if (len(sys.argv) > 3 and sys.argv[3] == "f32") \
        else jnp.float64
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)

    prof = Profiler()
    with prof.phase("assemble"):
        A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                             n_shards)
        b = A.mult(np.ones(A.global_num_rows))

    relax = (RelaxType[sys.argv[4]] if len(sys.argv) > 4
             else RelaxType.SOR)
    sweeps = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP, InterpType.ModClassical,
                             relax_type=relax)
    ml.num_smooth_sweeps = sweeps
    if dtype == jnp.float32:
        ml.solve_tol = 1e-5
    with prof.phase("setup(host)"):
        ml.setup(A)
    print(ml.print_hierarchy())
    print(ml.print_setup_times())

    mesh = dpar.make_mesh(n_shards)
    with prof.phase("device plans"):
        dh = DeviceHierarchy(ml, mesh, dtype=dtype)

    x0 = dh.vector(np.zeros_like(b))
    bd = dh.vector(b)
    with prof.phase("solve compile+first"):
        r = dh.solve(x0, bd)
        float(r.res[0])
    with prof.phase("solve (warm)"):
        r = dh.solve(x0, bd)
        iters = int(r.n_iters)
    print(prof.report())
    t = prof.times["solve (warm)"]
    print(f"{iters} V-cycles in {t:.4f}s -> {t / max(1, iters) * 1e3:.2f} "
          f"ms/cycle; rel resid {float(r.res[iters]):.3e}")
    nnz_cycle = sum(l.A.nnz for l in ml.levels)
    print(f"hierarchy nnz/cycle work: {nnz_cycle}, "
          f"{nnz_cycle * iters / t / 1e9:.3f} Gnnz/s effective")


if __name__ == "__main__":
    main()
