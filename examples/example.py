"""Canonical usage example — the equivalent of the reference's
examples/example.cpp (the README run: 2-D rotated anisotropic diffusion,
CLJP coarsening + modified classical interpolation + SOR smoothing,
theta = 0.25).

Run:  python examples/example.py [grid_n] [n_shards]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import os
import sys

import numpy as np

import jax

# the reference is double-precision throughout (core/types.hpp data_t);
# enable x64 before any jax array is created
jax.config.update("jax_enable_x64", True)
# honor JAX_PLATFORMS=cpu even when the TPU plugin's sitecustomize
# force-set the platform list (same override as tests/conftest.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())

    # assemble the problem
    stencil = diffusion_stencil_2d(eps=0.001, theta=np.pi / 8)
    A = par_stencil_grid(stencil, (n, n), n_shards)
    x_true = np.ones(A.global_num_rows)
    b = A.mult(x_true)

    # AMG setup (host) — strength -> CLJP -> mod classical P -> RAP per level
    ml = ParRugeStubenSolver(
        strong_threshold=0.25,
        coarsen_type=CoarsenType.CLJP,
        interp_type=InterpType.ModClassical,
        relax_type=RelaxType.SOR)
    ml.setup(A)
    print(ml.print_hierarchy())

    # device solve (jitted V-cycles over the mesh)
    mesh = dpar.make_mesh(n_shards)
    dh = DeviceHierarchy(ml, mesh)
    result = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))

    iters = int(result.n_iters)
    print(f"solved in {iters} V-cycles")
    for k in range(iters + 1):
        print(f"  iter {k:3d}: rel resid {float(result.res[k]):.6e}")

    x = dh.host(result.x)
    err = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    print(f"solution error vs exact: {err:.3e}")


if __name__ == "__main__":
    main()
