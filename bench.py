"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline: SpMV throughput (nnz/s) on the 27-pt Laplacian (the reference's
core kernel, examples/benchmark_spmv.cpp), measured honestly on this chip:
the SpMV is chained inside one jitted fori_loop and timed by the delta
between a long and a short chain, synchronized by a scalar fetch (plain
block_until_ready does not wait for remote completion on the axon relay).

The 128^3 grid makes the diagonal values array (27 x 2M x 4B = 226 MB)
far larger than VMEM, so the measurement reflects steady-state HBM
streaming, not VMEM residency.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
denominator is this chip's own streaming roofline, calibrated live with a
same-footprint elementwise pass: DIA SpMV moves ~4 bytes/nnz of matrix
values (+ amortized x/b traffic), so roofline = stream_bandwidth / 4.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LO, N_HI = 2, 102
REPS = 5


def _timed(fn, *args) -> float:
    """Best-of-REPS seconds for one call, synchronized via scalar fetch."""
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def _per_iter(chain, *args) -> float:
    # compile both chain lengths first
    float(chain(*args, N_LO))
    float(chain(*args, N_HI))
    t_lo = _timed(chain, *args, N_LO)
    t_hi = _timed(chain, *args, N_HI)
    return max(1e-9, (t_hi - t_lo) / (N_HI - N_LO))


def main():
    from raptor_tpu.device import par as dpar
    from raptor_tpu.gallery.stencils import (
        laplace_stencil_27pt, par_stencil_grid)

    n_dev = len(jax.devices())
    grid = (128, 128, 128)
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

    per_spmv = _per_iter(jax.jit(chain_fn, static_argnums=2), dA, x)
    nnz_s = A.nnz / per_spmv

    # live stream-bandwidth calibration with the same value-array footprint
    K = len(dA.dia_offsets)
    R = dA.rows_pad
    vals = jnp.asarray(
        np.random.default_rng(1).random((K, R)), jnp.float32)
    xv = jnp.asarray(np.random.default_rng(2).random(R), jnp.float32)

    def stream_fn(vals, xv, n):
        def body(_, xv):
            y = (vals * xv[None, :]).sum(axis=0)
            return y / jnp.max(jnp.abs(y))
        return jnp.sum(jax.lax.fori_loop(0, n, body, xv))

    per_stream = _per_iter(jax.jit(stream_fn, static_argnums=2), vals, xv)
    stream_bw = vals.size * vals.dtype.itemsize / per_stream   # B/s
    roofline_nnz_s = stream_bw / 4.0

    print(json.dumps({
        "metric": "spmv_nnz_per_s_laplacian27_128cubed_f32",
        "value": nnz_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_s / roofline_nnz_s,
    }))


if __name__ == "__main__":
    main()
