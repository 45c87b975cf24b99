"""SpMV benchmark, plain vs TAP comm (examples/benchmark_spmv.cpp,
benchmark_tap_spmv.cpp equivalents).

Run: python examples/benchmark_spmv.py [grid_n] [iters]
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

from raptor_tpu.comm.tap import build_tap_plan, device_put_tap
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import laplace_stencil_27pt, par_stencil_grid
from raptor_tpu.profiling.comm_model import model_comm_plan, model_tap_plan
from raptor_tpu.comm.plan import build_comm_plan


def _delta_time(chain, *args, n_lo=2, n_hi=502):
    def timed(n):
        t0 = time.perf_counter()
        float(chain(*args, n))
        return time.perf_counter() - t0
    timed(n_lo), timed(n_hi)
    lo = min(timed(n_lo) for _ in range(5))
    hi = min(timed(n_hi) for _ in range(5))
    return (hi - lo) / (n_hi - n_lo)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_dev = len(jax.devices())
    A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), n_dev)
    mesh = dpar.make_mesh(n_dev)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float32, lane_pad=128)
    x = dpar.device_put_vector(
        np.random.default_rng(0).random(A.global_num_cols),
        A.partition.col_bounds, dA.cols_pad, mesh, dtype=jnp.float32)

    def chain(dA, x, k):
        def body(_, x):
            b = dpar._shard_op(dpar.spmv_shard, mesh, dA, x)
            return b / jnp.max(jnp.abs(b))
        return jnp.sum(jax.lax.fori_loop(0, k, body, x))

    per = _delta_time(jax.jit(chain, static_argnums=2), dA, x)
    print(f"plain SpMV ({dA.on_format}): {per * 1e6:.1f} us "
          f"= {A.nnz / per / 1e9:.2f} Gnnz/s on {n_dev} device(s)")

    # static comm statistics
    stats = model_comm_plan(build_comm_plan(A), shards_per_host=max(
        1, n_dev // 2))
    print(stats)
    if n_dev >= 2:
        tap = build_tap_plan(A, 2, n_dev // 2)
        print(f"TAP dedup: {tap.dcn_values} vs plain "
              f"{tap.dcn_values_plain} inter-host values")


if __name__ == "__main__":
    main()
