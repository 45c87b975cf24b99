"""Per-phase AMG profile: setup splits by level + per-level V-cycle
timing + solve history (examples/profile_amg.cpp, profile_rss.cpp and
profile_tap_amg.cpp analogs — the reference prints strength/split/
interp/RAP per level and relax/spmv/transfer per cycle level via
track_times, multilevel/par_multilevel.hpp:127-205,412-457).

Run: python examples/profile_amg.py [grid_n] [coarsen] [interp] [tap]
  coarsen in {RS,CLJP,Falgout,PMIS,HMIS}; interp in
  {Direct,ModClassical,Extended}; tap=1 profiles the same hierarchy
  again with the topology-aware exchange on every level (2 x ndev/2
  mesh).
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
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    coarsen = (CoarsenType[sys.argv[2]] if len(sys.argv) > 2
               else CoarsenType.HMIS)
    interp = (InterpType[sys.argv[3]] if len(sys.argv) > 3
              else InterpType.Extended)
    tap = len(sys.argv) > 4 and sys.argv[4] not in ("0", "")
    n_dev = len(jax.devices())

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         n_dev)
    ml = ParRugeStubenSolver(strong_threshold=0.25, coarsen_type=coarsen,
                             interp_type=interp,
                             relax_type=RelaxType.SOR)
    t0 = time.perf_counter()
    ml.setup(A)
    t_setup = time.perf_counter() - t0
    print(ml.print_hierarchy())
    print(f"setup: {t_setup:.3f}s; per-level phase splits (s):")
    print(ml.print_setup_times())

    ml.solve_tol = 1e-6  # f32 hierarchy: don't burn cycles at the floor
    mesh = dpar.make_mesh(n_dev)
    dh = DeviceHierarchy(ml, mesh, dtype=jnp.float32)
    b = dh.vector(A.mult(np.ones(A.global_num_rows)))
    x = dh.vector(np.zeros(A.global_num_rows))
    t0 = time.perf_counter()
    res = dh.solve(x, b)
    res.x.block_until_ready()
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = dh.solve(x, b)
    res.x.block_until_ready()
    t_solve = time.perf_counter() - t0
    it = int(res.n_iters)
    print(f"\nsolve: {it} V-cycles to rel resid "
          f"{float(res.res[it]):.3e} in {t_solve:.3f}s warm "
          f"({t_first:.1f}s compile+first)")
    print("per-level cycle splits:")
    print(dh.print_times(reps=10))

    if tap and n_dev >= 4 and n_dev % 2 == 0:
        mesh2 = dpar.make_mesh2(2, n_dev // 2)
        ml.tap_amg = 0
        dh2 = DeviceHierarchy(ml, mesh2, dtype=jnp.float32)
        r2 = dh2.solve(dh2.vector(np.zeros(A.global_num_rows)),
                       dh2.vector(np.asarray(dpar.host_vector(
                           np.asarray(b), dh.row_bounds))))
        r2.x.block_until_ready()
        t0 = time.perf_counter()
        r2 = dh2.solve(dh2.vector(np.zeros(A.global_num_rows)),
                       dh2.vector(np.asarray(dpar.host_vector(
                           np.asarray(b), dh.row_bounds))))
        r2.x.block_until_ready()
        t_tap = time.perf_counter() - t0
        print(f"\nTAP 2x{n_dev // 2} mesh: {int(r2.n_iters)} V-cycles "
              f"in {t_tap:.3f}s warm")


if __name__ == "__main__":
    main()
