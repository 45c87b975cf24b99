"""Cache-cleared SpMV sweep (examples/benchmark_spmv.cpp +
clear_cache.hpp analog).

The reference flushes the CPU cache between timed SpMVs so every rep
streams from DRAM. The TPU analog: small problems can go VMEM-resident
across chained iterations, overstating HBM throughput — so between
reps this sweep streams a >VMEM dummy buffer ("cache clear"), and
reports both the resident (chained) and streamed (cleared) rates per
size and format.

Run: python examples/benchmark_spmv_sweep.py [f32|f64] [sizes...]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import laplace_stencil_27pt, par_stencil_grid

VMEM_BYTES = 128 << 20


def _chain(mesh, dA, x, n_iters, flush=None):
    """n_iters SpMVs; optionally touch a >VMEM buffer between reps."""
    def run(A, x, fl):
        def body_fn(A, x, fl):
            A = jax.tree.map(lambda l: l[0], A)
            def body(i, st):
                x, acc = st
                y = dpar.spmv_shard(A, x[: A.cols_pad])
                if fl is not None:
                    acc = acc + jnp.sum(fl[0] * (1.0 + y[0]))
                return (y / (1.0 + jnp.max(jnp.abs(y))), acc)
            x0 = x[0]
            acc0 = jax.lax.pcast(jnp.zeros((), x0.dtype),
                                 (dpar.comm_axes(),), to="varying")
            out, acc = jax.lax.fori_loop(0, n_iters, body, (x0, acc0))
            return jax.lax.psum(jnp.sum(out) + acc, dpar.comm_axes())
        from jax.sharding import PartitionSpec as P
        specs = (dpar.leaf_specs(A), P(dpar.ROW_AXIS, None),
                 (P(dpar.ROW_AXIS, None) if fl is not None else None))
        return jax.shard_map(body_fn, mesh=mesh, in_specs=specs,
                             out_specs=P())(A, x, fl)

    f = jax.jit(run)
    float(f(dA, x, flush))
    t0 = time.perf_counter()
    float(f(dA, x, flush))
    return time.perf_counter() - t0


def main():
    import os
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    dtype = jnp.float32 if (len(sys.argv) > 1 and sys.argv[1] == "f32") \
        else jnp.float64
    if dtype == jnp.float64:
        jax.config.update("jax_enable_x64", True)
    sizes = [int(s) for s in sys.argv[2:]] or [32, 48, 64, 96]
    mesh = dpar.make_mesh(1)
    reps = 20
    global VMEM_BYTES
    if jax.devices()[0].platform != "tpu":
        VMEM_BYTES = 8 << 20    # quick functional pass off-TPU
    for n in sizes:
        A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), 1)
        dA = dpar.device_put_matrix(A, mesh, dtype=dtype,
                                    need_transpose=False)
        x = jnp.ones((1, dA.cols_pad), dtype)
        itemsize = jnp.dtype(dtype).itemsize
        flush_elems = VMEM_BYTES // itemsize
        flush = jnp.ones((1, flush_elems), dtype)
        t_res = _chain(mesh, dA, x, reps) / reps
        t_clr = _chain(mesh, dA, x, reps, flush) / reps
        # subtract the flush stream's own traffic estimate
        nnz = A.local_nnz
        print(f"{n}^3 ({nnz / 1e6:.1f}M nnz, {dA.on_format}): "
              f"resident {nnz / t_res / 1e9:.1f} Gnnz/s, "
              f"cleared-chain {nnz / t_clr / 1e9:.1f} Gnnz/s "
              f"(incl. {VMEM_BYTES >> 20} MB flush/rep)")


if __name__ == "__main__":
    main()
