"""Transfer-operator format shoot-out: auto vs well vs bell vs ell on
the level-0 P / P^T of a 3-D extended+i hierarchy (the operators that
dominated the 128^3 solve before the windowed-ELL/BELL kernels).

Builds the PMIS+Extended hierarchy at ``grid_n^3`` (cached to
``--cache DIR`` as npz so reruns skip the ~60 s setup), packs P and P^T
in each device format, verifies every pack against the host product,
and times the forward apply with the chained-fori_loop delta method.

Run (real chip):  python examples/benchmark_transfer_formats.py 128
Run (CPU mesh):   JAX_PLATFORMS=cpu python examples/benchmark_transfer_formats.py 48
One format only (chip-fault isolation — a bad HBM->VMEM DMA can wedge
the chip, so probe unproven kernels one per process under timeout):
    python examples/benchmark_transfer_formats.py 48 /tmp well
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
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.device import par as dpar


def _build_or_load(n, cache):
    ops = {}
    files = {k: os.path.join(cache, f"transfer{n}_{k}.npz")
             for k in ("P", "Pt")}
    if all(os.path.exists(f) for f in files.values()):
        for k, f in files.items():
            z = np.load(f)
            ops[k] = CSRMatrix(int(z["n_rows"]), int(z["n_cols"]),
                               z["indptr"], z["indices"], z["data"])
        return ops
    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.gallery.stencils import (laplace_stencil_27pt,
                                             par_stencil_grid)
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
    from raptor_tpu.utils.hostmem import pin_arena
    pin_arena(prefault_bytes=4 << 30)
    A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), 1)
    ml = ParRugeStubenSolver(0.25, CoarsenType.PMIS, InterpType.Extended)
    ml.setup(A)
    ops["P"] = ml.levels[0].P._g()
    ops["Pt"] = ml.levels[0].P.transpose()._g()
    for k, f in files.items():
        g = ops[k]
        np.savez(f, indptr=g.indptr, indices=g.indices, data=g.data,
                 n_rows=g.n_rows, n_cols=g.n_cols)
    return ops


def _time_apply(mesh, dA, x):
    def chain(dA, x, n):
        def body(_, x):
            b = dpar._shard_op(dpar.spmv_shard, mesh, dA, x)
            # feed a (numerically negligible) function of b back into x:
            # without the dependency XLA hoists the SpMV out of the loop
            # and the delta method measures nothing
            return x * (1.0 + 1e-30 * jnp.sum(b))
        return jnp.sum(jax.lax.fori_loop(0, n, body, x))
    f = jax.jit(chain, static_argnums=2)
    float(f(dA, x, 2))
    float(f(dA, x, 52))

    def t(n):
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            float(f(dA, x, n))
            best = min(best, time.perf_counter() - t0)
        return best
    return (t(52) - t(2)) / 50


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cache = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    only = sys.argv[3] if len(sys.argv) > 3 else None
    fmts = (None, "well", "wellt", "bell", "ell") if only is None else \
        ((None,) if only == "auto" else (only,))
    ops = _build_or_load(n, cache)
    mesh = dpar.make_mesh(1)
    for name, embed in (("P", "cols"), ("Pt", "rows")):
        a = ops[name]
        A = ParCSRMatrix(a, Partition.create(a.n_rows, a.n_cols, 1))
        print(f"== {name}: {a.n_rows} x {a.n_cols}, nnz {a.indptr[-1]} ==")
        xh = np.random.default_rng(0).random(a.n_cols)
        ref = a.mult(xh)
        for fmt in fmts:
            try:
                kw = dict(dtype=jnp.float32, lane_pad=128,
                          need_transpose=False, embed=embed)
                if fmt:
                    kw["force_format"] = fmt
                dA = dpar.device_put_matrix(A, mesh, **kw)
                x = dpar.device_put_vector(
                    xh, A.partition.col_bounds, dA.cols_pad, mesh,
                    dtype=jnp.float32)
                y = dpar._shard_op(dpar.spmv_shard, mesh, dA, x)
                yh = dpar.host_vector(np.asarray(y),
                                      A.partition.row_bounds)
                err = np.abs(yh - ref).max() / max(1.0, np.abs(ref).max())
                assert err < 1e-4, err
                per = _time_apply(mesh, dA, x)
                print(f"  {(fmt or 'auto') + '(' + dA.on_format + ')':20s}"
                      f": {per * 1e3:8.3f} ms/apply  (err {err:.1e})")
            except Exception as e:
                print(f"  {fmt or 'auto':20s}: FAILED "
                      f"{type(e).__name__}: {e}"[:160])


if __name__ == "__main__":
    main()
