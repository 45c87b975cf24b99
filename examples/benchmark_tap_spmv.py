"""Timed plain vs topology-aware SpMV / SpMV^T on a 2-D (host, local)
mesh (examples/benchmark_tap_spmv.cpp + profile_tap_steps.cpp analog:
the reference times ParMatrix::mult vs tap_mult over live MPI,
util/linalg/par_spmv.cpp:25-89).

Both paths run the identical on/off split SpMV; only the halo exchange
differs: one flat all_to_all over the whole mesh vs the 4-step TAP
schedule (local_L / local_S / global / local_R) that keeps fan-out on
the intra-host axis. Alongside the measured times the static comm
model prints the inter-host byte counts each schedule moves.

Run: python examples/benchmark_tap_spmv.py [grid_n] [hosts] [local]
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

from raptor_tpu.comm.plan import build_comm_plan
from raptor_tpu.comm.tap import build_tap_plan, device_put_tap
from raptor_tpu.device import par as dpar
from raptor_tpu.device.tap_ops import (
    tap_spmv_shard, tap_spmv_T_shard, _specs)
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.profiling.comm_model import model_comm_plan, model_tap_plan


def _delta_time(chain, *args, n_lo=2, n_hi=202):
    def timed(n):
        t0 = time.perf_counter()
        float(chain(*args, n))
        return time.perf_counter() - t0
    timed(n_lo), timed(n_hi)
    lo = min(timed(n_lo) for _ in range(5))
    hi = min(timed(n_hi) for _ in range(5))
    return (hi - lo) / (n_hi - n_lo)


def _make_chain(mesh, shard_fn, tap):
    """Whole fori_loop chain inside ONE shard_map (one compiled program;
    per-iteration normalization keeps values bounded)."""
    from jax.sharding import PartitionSpec as P

    def body(A, T, x, k):
        Ash = jax.tree.map(lambda l: l[0], A)
        Tsh = jax.tree.map(lambda l: l[0], T)

        def it(_, v):
            b = shard_fn(Ash, Tsh, v) if tap else shard_fn(Ash, v)
            m = jax.lax.pmax(jnp.max(jnp.abs(b)), ("host", "local"))
            return b / m

        return jax.lax.fori_loop(0, k, it, x[0])[None]

    def chain(A, T, x, k):
        return jnp.sum(jax.shard_map(
            lambda A, T, x: body(A, T, x, k), mesh=mesh,
            in_specs=_specs((A, T, x)),
            out_specs=P(("host", "local"), None))(A, T, x))

    return jax.jit(chain, static_argnums=3)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_dev = len(jax.devices())
    assert H * L <= n_dev, f"need {H * L} devices, have {n_dev}"

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         H * L)
    mesh = dpar.make_mesh2(H, L)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float32, lane_pad=128)
    T = device_put_tap(build_tap_plan(A, H, L), mesh, dtype=jnp.float32)
    x = dpar.device_put_vector(
        np.random.default_rng(0).random(A.global_num_cols),
        A.partition.col_bounds, dA.cols_pad, mesh, dtype=jnp.float32)

    # equality of the two paths before timing them
    from jax.sharding import PartitionSpec as P

    def _plain_once(A, xv):
        def body(A, xv):
            Ash = jax.tree.map(lambda l: l[0], A)
            return dpar.spmv_shard(Ash, xv[0])[None]
        return jax.jit(lambda A, xv: jax.shard_map(
            body, mesh=mesh, in_specs=_specs((A, xv)),
            out_specs=P(("host", "local"), None))(A, xv))(A, xv)

    with dpar.use_comm_axes(("host", "local")):
        b_plain = _plain_once(dA, x)
    from raptor_tpu.device.tap_ops import tap_spmv
    b_tap = tap_spmv(mesh, dA, T, x)
    err = float(jnp.max(jnp.abs(b_plain - b_tap)))
    assert err < 1e-4 * float(jnp.max(jnp.abs(b_plain))), err

    with dpar.use_comm_axes(("host", "local")):
        per_plain = _delta_time(
            _make_chain(mesh, dpar.spmv_shard, tap=False), dA, T, x)
        per_plain_T = _delta_time(
            _make_chain(mesh, dpar.spmv_T_shard, tap=False), dA, T, x)
    per_tap = _delta_time(_make_chain(mesh, tap_spmv_shard, tap=True),
                          dA, T, x)
    per_tap_T = _delta_time(_make_chain(mesh, tap_spmv_T_shard, tap=True),
                            dA, T, x)

    gn = A.nnz / 1e9
    print(f"{H}x{L} mesh, {n}x{n} aniso, nnz={A.nnz} ({dA.on_format})")
    print(f"plain SpMV   {per_plain * 1e6:9.1f} us  "
          f"{gn / per_plain:7.2f} Gnnz/s")
    print(f"TAP   SpMV   {per_tap * 1e6:9.1f} us  "
          f"{gn / per_tap:7.2f} Gnnz/s")
    print(f"plain SpMV^T {per_plain_T * 1e6:9.1f} us  "
          f"{gn / per_plain_T:7.2f} Gnnz/s")
    print(f"TAP   SpMV^T {per_tap_T * 1e6:9.1f} us  "
          f"{gn / per_tap_T:7.2f} Gnnz/s")

    plain_stats = model_comm_plan(build_comm_plan(A), shards_per_host=L)
    tap_stats = model_tap_plan(build_tap_plan(A, H, L))
    saved = plain_stats.inter_host_bytes - tap_stats.inter_host_bytes
    print(f"DCN bytes/exchange: plain {plain_stats.inter_host_bytes} vs "
          f"TAP {tap_stats.inter_host_bytes} "
          f"({100.0 * saved / max(1, plain_stats.inter_host_bytes):.1f}% "
          f"saved)")


if __name__ == "__main__":
    main()
