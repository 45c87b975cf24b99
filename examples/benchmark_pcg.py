"""CG vs AMG-preconditioned CG benchmark (examples/benchmark_pcg.cpp).

Runs plain CG and AMG-PCG on the rotated anisotropic diffusion problem
and reports iterations + wall time for each (the reference additionally
splits comm_t/precond_t, krylov/par_cg.cpp:121-239; here the comm model
is static — see profiling/comm_model.py — and XLA fuses the cycle, so
the split is reported as solver-phase wall times).

Run: python examples/benchmark_pcg.py [grid_n] [n_shards] [f32|f64]
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

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.krylov.cg import cg
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    if len(sys.argv) > 3 and sys.argv[3] == "f64":
        jax.config.update("jax_enable_x64", True)
        dtype = jnp.float64
    else:
        dtype = jnp.float32

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         n_shards)
    bh = A.mult(np.ones(A.global_num_rows))

    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP, InterpType.ModClassical,
                             relax_type=RelaxType.Chebyshev)
    ml.num_smooth_sweeps = 3
    t0 = time.perf_counter()
    ml.setup(A)
    t_setup = time.perf_counter() - t0
    mesh = dpar.make_mesh(n_shards)
    t0 = time.perf_counter()
    dh = DeviceHierarchy(ml, mesh, dtype=dtype)
    t_plan = time.perf_counter() - t0

    dA = dh.levels[0].A
    x0 = dh.vector(np.zeros_like(bh))
    b = dh.vector(bh)
    tol = 1e-5 if dtype == jnp.float32 else 1e-8

    # plain CG (compile, then time)
    r = cg(mesh, dA, x0, b, tol=tol, max_iter=20000)
    int(r.n_iters)
    t0 = time.perf_counter()
    r = cg(mesh, dA, x0, b, tol=tol, max_iter=20000)
    cg_iters = int(r.n_iters)
    t_cg = time.perf_counter() - t0

    # AMG-PCG (one precond pack object so the jit cache hits on rerun)
    pp = dh.precond_pack()
    rp = cg(mesh, dA, x0, b, tol=tol, max_iter=200, precond=pp)
    int(rp.n_iters)
    t0 = time.perf_counter()
    rp = cg(mesh, dA, x0, b, tol=tol, max_iter=200, precond=pp)
    pcg_iters = int(rp.n_iters)
    t_pcg = time.perf_counter() - t0

    print(f"setup(host) {t_setup:.2f}s, device plans {t_plan:.2f}s")
    print(f"CG    : {cg_iters:4d} iters in {t_cg:.3f}s "
          f"({t_cg / max(1, cg_iters) * 1e3:.2f} ms/iter)")
    print(f"AMG-PCG: {pcg_iters:4d} iters in {t_pcg:.3f}s "
          f"({t_pcg / max(1, pcg_iters) * 1e3:.2f} ms/iter)")


if __name__ == "__main__":
    main()
