"""Benchmark driver: prints ONE JSON line with the headline metric.

Current headline: sharded SpMV throughput (nnz/s) on the 27-pt Laplacian,
the reference's core kernel (examples/benchmark_spmv.cpp). ``vs_baseline``
is the fraction of the memory-bandwidth roofline achieved on this chip
(SpMV is bandwidth-bound: ~16 bytes of traffic per nonzero in f32 ELL —
4B val + 4B col + ~4B gathered x + ~4B amortized write; v5e HBM ~819 GB/s
=> roofline ~51 Gnnz/s). The reference publishes no numbers (BASELINE.md),
so speed-of-light fraction is the honest denominator.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from raptor_tpu.device import par as dpar
    from raptor_tpu.gallery.stencils import laplace_stencil_27pt, par_stencil_grid

    n_dev = len(jax.devices())
    grid = (64, 64, 64)
    A = par_stencil_grid(laplace_stencil_27pt(), grid, n_dev)
    mesh = dpar.make_mesh(n_dev)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float32, lane_pad=128)
    part = A.partition
    x = dpar.device_put_vector(
        np.random.default_rng(0).random(A.global_num_cols),
        part.col_bounds, dA.cols_pad, mesh, dtype=jnp.float32)

    # warmup + compile
    b = dpar.spmv(mesh, dA, x)
    b.block_until_ready()

    iters = 100
    t0 = time.perf_counter()
    for _ in range(iters):
        b = dpar.spmv(mesh, dA, x)
    b.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    nnz_s = A.nnz / dt
    # roofline: bandwidth-bound nnz/s on this chip generation
    hbm_gbps = 819e9  # v5e
    bytes_per_nnz = 16.0
    roofline = hbm_gbps / bytes_per_nnz

    print(json.dumps({
        "metric": "spmv_nnz_per_s_laplacian27_64cubed",
        "value": nnz_s,
        "unit": "nnz/s",
        "vs_baseline": nnz_s / roofline,
    }))


if __name__ == "__main__":
    main()
