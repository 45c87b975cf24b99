"""Topology-aware AMG benchmark (examples/benchmark_tap_amg.cpp
equivalent): the same hierarchy solved with the plain halo exchange on
a flat mesh and with the TAP 3-step schedule on a 2-D (host, local)
mesh, from every activation level.

The reference times V-cycles with tap_amg = 0 (all levels) after
building TAPComm on each level; here `tap_level` sweeps which levels
get the staged exchange (coarse levels benefit most — their halos are
the least local), mirroring the reference's tap_amg knob
(multilevel/par_multilevel.hpp:111 tap_amg).

Run: python examples/benchmark_tap_amg.py [grid_n] [hosts]
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
import jax.numpy as jnp

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def timed_solve(dh, b):
    x0 = dh.vector(np.zeros_like(b))
    bd = dh.vector(b)
    r = dh.solve(x0, bd)            # compile + first
    r.x.block_until_ready()
    t0 = time.perf_counter()
    r = dh.solve(x0, bd)
    r.x.block_until_ready()
    dt = time.perf_counter() - t0
    return int(r.n_iters), dt


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_dev = len(jax.devices())
    hosts = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    assert n_dev % hosts == 0, "hosts must divide device count"
    local = n_dev // hosts

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         n_dev)
    b = A.mult(np.ones(A.global_num_rows))

    ml = ParRugeStubenSolver(0.25, CoarsenType.HMIS, InterpType.Extended,
                             relax_type=RelaxType.SOR)
    ml.solve_tol = 1e-6
    ml.setup(A)
    print(ml.print_hierarchy())
    n_levels = len(ml.levels)

    # plain halo exchange, flat 1-D mesh
    dh = DeviceHierarchy(ml, dpar.make_mesh(n_dev), dtype=jnp.float32)
    iters, dt = timed_solve(dh, b)
    print(f"plain   1x{n_dev}: {iters} V-cycles {dt:.4f}s "
          f"({dt / max(1, iters) * 1e3:.2f} ms/cycle)")

    # TAP from level k on the (hosts, local) mesh
    mesh2 = dpar.make_mesh2(hosts, local)
    for k in range(n_levels - 1, -1, -1):
        ml.tap_amg = k
        dh2 = DeviceHierarchy(ml, mesh2, dtype=jnp.float32)
        iters, dt = timed_solve(dh2, b)
        print(f"tap>={k} {hosts}x{local}: {iters} V-cycles {dt:.4f}s "
              f"({dt / max(1, iters) * 1e3:.2f} ms/cycle)")
    ml.tap_amg = -1


if __name__ == "__main__":
    main()
