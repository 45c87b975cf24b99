"""Conjugate gradient, plain and AMG-preconditioned, fully on device.

Semantics match the reference (krylov/par_cg.cpp):
- ``res[k] = ||r_k|| / ||b||`` with ``||b||`` clamped to 1 when ~0 (:21-22)
- convergence on ``||r|| <= tol * ||r_0||`` (:47-50)
- the true residual ``b - Ax`` is recomputed every 8 iterations, otherwise
  ``r -= alpha A p`` (:51-52, :75-83)
- default ``max_iter = 1.3 n + 2`` (:24-27)
- an indefiniteness flag replaces the reference's abort (:63-70)

The whole iteration runs inside one ``shard_map`` + ``lax.while_loop``:
per-iteration global communication is exactly one halo exchange (inside the
SpMV) plus two ``psum`` inner products, all scheduled by XLA on ICI.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raptor_tpu.device import par as dpar
from raptor_tpu.device.par import DeviceParCSR, dot_shard, spmv_shard


class CGResult(NamedTuple):
    x: jnp.ndarray          # [S, R] solution
    res: jnp.ndarray        # [max_iter+1] relative residual history, padded
                            # with -1 past convergence
    n_iters: jnp.ndarray    # scalar int
    indefinite: jnp.ndarray  # scalar bool


def _cg_shard(A: DeviceParCSR, x, b, tol: float, max_iter: int,
              precond=None, zero_tol: float = 1e-16):
    dtype = b.dtype
    b_norm = jnp.sqrt(dot_shard(b, b))
    b_norm = jnp.where(b_norm < zero_tol, 1.0, b_norm)

    r = b - spmv_shard(A, x)
    if precond is None:
        z = r
    else:
        z = precond(jnp.zeros_like(r), r)
    p = z
    rz = dot_shard(r, z)
    norm_r = jnp.sqrt(dot_shard(r, r))
    res0 = norm_r / b_norm
    res_hist = jnp.full(max_iter + 1, -1.0, dtype=dtype).at[0].set(res0)
    atol = tol * norm_r

    def cond(state):
        _, _, _, _, norm_r, k, _, indef = state
        return (norm_r > atol) & (k < max_iter) & (~indef)

    def body(state):
        x, r, p, rz, norm_r, k, res_hist, indef = state
        Ap = spmv_shard(A, p)
        App = dot_shard(Ap, p)
        indef = indef | (App < 0.0)
        alpha = rz / App
        x = x + alpha * p
        # true-residual recompute every 8th iteration (par_cg.cpp:75-83);
        # k is replicated so all shards take the same branch
        r = jax.lax.cond(k % 8 == 0,
                         lambda: b - spmv_shard(A, x),
                         lambda: r - alpha * Ap)
        if precond is None:
            z = r
            rz_next = dot_shard(r, r)
            norm_r = jnp.sqrt(rz_next)
        else:
            z = precond(jnp.zeros_like(r), r)
            rz_next = dot_shard(r, z)
            norm_r = jnp.sqrt(dot_shard(r, r))
        beta = rz_next / rz
        p = z + beta * p
        k = k + 1
        res_hist = res_hist.at[k].set(norm_r / b_norm)
        return x, r, p, rz_next, norm_r, k, res_hist, indef

    state = (x, r, p, rz, norm_r, jnp.array(0), res_hist,
             jnp.array(False))
    x, r, p, rz, norm_r, k, res_hist, indef = jax.lax.while_loop(
        cond, body, state)
    return x, res_hist, k, indef


from raptor_tpu.krylov._cache import RunCache, precond_key

# compiled-solver cache: a fresh @jax.jit closure per call would retrace
# and (through a remote compile service) recompile every solve; bounded
# LRU so old hierarchies' device buffers are released
_RUN_CACHE = RunCache()


def cg(mesh, A: DeviceParCSR, x0, b, tol: float = 1e-5,
       max_iter: Optional[int] = None, precond=None) -> CGResult:
    """Global CG solve. ``precond``, if given, is the 4-tuple
    ``(data, specs, strip, apply)`` from ``DeviceHierarchy.precond_pack()``
    — this is PCG (par_cg.cpp:121-239)."""
    if max_iter is None:
        max_iter = int(1.3 * A.global_num_rows) + 2

    pdata, pspecs = ((), ())
    if precond is not None:
        data, specs, strip, apply = precond
        pdata, pspecs = (data,), (specs,)

    # tol is a traced operand: one compile serves every tolerance
    # (through a remote-compile relay each distinct program costs
    # seconds to minutes)
    tolv = jnp.asarray(tol, dtype=b.dtype)
    cache_key = ("cg", mesh, max_iter, precond_key(precond))
    hit = _RUN_CACHE.get(cache_key)
    if hit is not None:
        # the cached entry keeps the precond closures alive, so the ids
        # in the key stay valid for the entry's lifetime
        return CGResult(*hit[0](A, x0, b, tolv, *pdata))

    @jax.jit
    def run(A, x0, b, tolv, *pd):
        def body(A, x0, b, tolv, *pd):
            A = jax.tree.map(lambda l: l[0], A)
            pfn = None
            if precond is not None:
                d = strip(pd[0])
                pfn = lambda x0_, r_: apply(d, x0_, r_)
            x, res, k, indef = _cg_shard(A, x0[0], b[0], tolv, max_iter,
                                         pfn)
            return x[None], res, k, indef

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=dpar.leaf_specs((A, x0, b)) + (P(),) + pspecs,
            out_specs=(P(dpar.ROW_AXIS, None), P(), P(), P()))(
                A, x0, b, tolv, *pd)

    _RUN_CACHE.put(cache_key, (run, precond))
    return CGResult(*run(A, x0, b, tolv, *pdata))
