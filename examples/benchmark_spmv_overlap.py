"""Comm/compute overlap in the sharded SpMV
(examples/benchmark_spmv_overlap.cpp + benchmark_tap_spmv.cpp analog).

The reference overlaps MPI halo exchange with the on-process SpMV by
hand (Isend/Irecv + local compute + Waitall). Under XLA the overlap is
the latency-hiding scheduler's job: the halo all_to_all and the
on-shard streaming passes have no data dependence until the off-block
accumulate, so the compiler interleaves them. This driver measures how
much that is worth by timing the normal SpMV against a variant with an
explicit ``optimization_barrier`` forcing the exchange to complete
before any compute starts.

Run: python examples/benchmark_spmv_overlap.py [grid_n] [n_shards]
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import laplace_stencil_27pt, par_stencil_grid


def spmv_serialized_shard(A, x):
    """spmv_shard with the exchange SERIALIZED before compute (the
    non-overlapped ordering the reference's benchmark compares)."""
    halo = dpar.halo_exchange(A, x)
    # barrier: on-shard compute may not be scheduled before the
    # exchange completes
    halo, x = jax.lax.optimization_barrier((halo, x))
    b = dpar.on_spmv_shard(A, x)
    return b + dpar.off_spmv(A.off_rows, A.off_cols, A.off_vals, halo,
                             A.rows_pad)


def _per_iter(mesh, op, dA, x):
    def chain(dA, x, n):
        def body(_, c):
            b = dpar._shard_op(op, mesh, dA, x)
            return c + jnp.sum(b)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
    f = jax.jit(chain, static_argnums=2)
    float(f(dA, x, 2))
    float(f(dA, x, 102))

    def t(n):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(dA, x, n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(102) - t(2)) / 100


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), n_dev)
    mesh = dpar.make_mesh(n_dev)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float32, lane_pad=128)
    x = dpar.device_put_vector(
        np.random.default_rng(0).random(A.global_num_cols),
        A.partition.col_bounds, dA.cols_pad, mesh, dtype=jnp.float32)

    t_over = _per_iter(mesh, dpar.spmv_shard, dA, x)
    t_serial = _per_iter(mesh, spmv_serialized_shard, dA, x)
    print(f"overlapped : {t_over * 1e6:9.1f} us/SpMV "
          f"({A.nnz / t_over / 1e9:.2f} Gnnz/s)")
    print(f"serialized : {t_serial * 1e6:9.1f} us/SpMV "
          f"({A.nnz / t_serial / 1e9:.2f} Gnnz/s)")
    print(f"overlap gain: {100.0 * (t_serial - t_over) / max(t_serial, 1e-12):.1f}%")


if __name__ == "__main__":
    main()
