"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: SpMV throughput (nnz/s) on the 27-pt Laplacian (the reference's
core kernel, examples/benchmark_spmv.cpp), measured honestly on this chip:
the SpMV is chained inside one jitted fori_loop and timed by the delta
between a long and a short chain, synchronized by a scalar fetch (plain
block_until_ready does not wait for remote completion on the axon relay).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is this chip's own streaming roofline, calibrated live with a
same-footprint elementwise pass: SpMV in DIA form moves ~8 bytes/nnz
(4B diagonal value + amortized x/b traffic in f32), so
roofline = measured_stream_bandwidth / 8.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args) -> float:
    """Seconds for one call, synchronized via scalar fetch."""
    t0 = time.perf_counter()
    float(fn(*args))
    return time.perf_counter() - t0


def main():
    from raptor_tpu.device import par as dpar
    from raptor_tpu.gallery.stencils import (
        laplace_stencil_27pt, par_stencil_grid)

    n_dev = len(jax.devices())
    grid = (64, 64, 64)
    A = par_stencil_grid(laplace_stencil_27pt(), grid, n_dev)
    mesh = dpar.make_mesh(n_dev)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float32, lane_pad=128)
    part = A.partition
    x = dpar.device_put_vector(
        np.random.default_rng(0).random(A.global_num_cols),
        part.col_bounds, dA.cols_pad, mesh, dtype=jnp.float32)

    def chain_fn(dA, x, n):
        def body(_, x):
            b = dpar._shard_op(dpar.spmv_shard, mesh, dA, x)
            return b / jnp.max(jnp.abs(b))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))

    chain = jax.jit(chain_fn, static_argnums=2)
    N_LO, N_HI = 2, 202
    # compile both variants
    _timed(chain, dA, x, N_LO)
    _timed(chain, dA, x, N_HI)
    t_lo = min(_timed(chain, dA, x, N_LO) for _ in range(2))
    t_hi = min(_timed(chain, dA, x, N_HI) for _ in range(2))
    per_spmv = max(1e-9, (t_hi - t_lo) / (N_HI - N_LO))
    nnz_s = A.nnz / per_spmv

    # live stream-bandwidth calibration with the same footprint
    K = len(dA.dia_offsets)
    vals = jnp.asarray(
        np.random.default_rng(1).random((K, dA.rows_pad)), jnp.float32)
    xv = jnp.asarray(np.random.default_rng(2).random(dA.rows_pad),
                     jnp.float32)

    def stream_fn(vals, xv, n):
        def body(_, xv):
            y = (vals * xv[None, :]).sum(axis=0)
            return y / jnp.max(jnp.abs(y))
        return jnp.sum(jax.lax.fori_loop(0, n, body, xv))

    stream = jax.jit(stream_fn, static_argnums=2)
    _timed(stream, vals, xv, N_LO)
    _timed(stream, vals, xv, N_HI)
    s_lo = min(_timed(stream, vals, xv, N_LO) for _ in range(2))
    s_hi = min(_timed(stream, vals, xv, N_HI) for _ in range(2))
    per_stream = max(1e-9, (s_hi - s_lo) / (N_HI - N_LO))
    stream_bw = vals.size * 4 / per_stream          # B/s
    roofline_nnz_s = stream_bw / 8.0

    print(json.dumps({
        "metric": "spmv_nnz_per_s_laplacian27_64cubed_f32",
        "value": nnz_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_s / roofline_nnz_s,
    }))


if __name__ == "__main__":
    main()
