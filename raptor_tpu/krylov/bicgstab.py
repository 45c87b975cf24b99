"""BiCGStab family: plain, AMG-preconditioned, and the communication-
reducing research variants.

Matches the reference (krylov/par_bicgstab.cpp):
- ``BiCGStab`` :11 — res stores ABSOLUTE ||r||, tol is relative to r0
- ``Pre_BiCGStab`` :240 — right-preconditioned with an AMG cycle on p and s
- ``SeqInner/SeqNorm/SeqInnerSeqNorm_BiCGStab`` :128,:372,:481 — inner
  products/norms computed in a deterministic shard-sequential order
  (krylov/partial_inner.cpp:103 ``sequential_inner``): here an all_gather of
  shard-local partials summed in shard order (bitwise shard-count-stable for
  fixed shard sums)
- ``PI_BiCGStab``/``PrePI_BiCGStab`` :593,:738 — approximate inner products
  over half the shards, scaled by global_n/part_global
  (partial_inner.cpp:208 ``half_inner``), alternating halves per iteration
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raptor_tpu.device import par as dpar
from raptor_tpu.device.par import DeviceParCSR, ROW_AXIS, spmv_shard


class BiCGStabResult(NamedTuple):
    x: jnp.ndarray
    res: jnp.ndarray      # absolute ||r|| history, padded with -1
    n_iters: jnp.ndarray


def _seq_inner(x, y):
    """Deterministic shard-ordered reduction (sequential_inner,
    partial_inner.cpp:103-137). One-hot psum collects the per-shard partial
    dots exactly (each slot sums one value), typed as replicated; the ordered
    cumsum then fixes the summation order independent of shard count."""
    local = jnp.vdot(x, y)
    s = jax.lax.axis_size(ROW_AXIS)
    idx = jax.lax.axis_index(ROW_AXIS)
    onehot = (jnp.arange(s) == idx).astype(local.dtype)
    parts = jax.lax.psum(onehot * local, ROW_AXIS)   # [S], replicated
    return jnp.cumsum(parts)[-1]


def _psum_inner(x, y):
    return jax.lax.psum(jnp.vdot(x, y), ROW_AXIS)


def _make_partial_inner(n_valid_local, global_n):
    """Approximate inner product over half the shards
    (half_inner, partial_inner.cpp:208-278)."""
    def partial_inner(x, y, parity):
        s = jax.lax.axis_size(ROW_AXIS)
        idx = jax.lax.axis_index(ROW_AXIS)
        in_half = jnp.where(parity == 0, idx < (s + 1) // 2,
                            idx >= (s + 1) // 2)
        part_global = jax.lax.psum(
            jnp.where(in_half, n_valid_local, 0), ROW_AXIS)
        inner = jax.lax.psum(
            jnp.where(in_half, jnp.vdot(x, y), 0.0), ROW_AXIS)
        return inner * (global_n / jnp.maximum(part_global, 1))
    return partial_inner


def _bicgstab_shard(A: DeviceParCSR, x, b, tol, max_iter, precond,
                    inner_mode: str, norm_mode: str, partial: bool):
    dtype = b.dtype
    n_valid = jnp.sum(A.row_mask).astype(dtype)
    pinner = _make_partial_inner(n_valid, float(A.global_num_rows))

    def inner(u, v, parity):
        if partial:
            return pinner(u, v, parity)
        if inner_mode == "sequential":
            return _seq_inner(u, v)
        return _psum_inner(u, v)

    def norm2(u):
        if norm_mode == "sequential":
            return jnp.sqrt(_seq_inner(u, u))
        return jnp.sqrt(_psum_inner(u, u))

    def M(v):
        if precond is None:
            return v
        return precond(jnp.zeros_like(v), v)

    r = b - spmv_shard(A, x)
    r_star = r
    p = r
    rr = inner(r, r_star, 0)
    norm_r = norm2(r)
    res_hist = jnp.full(max_iter + 1, -1.0, dtype=dtype).at[0].set(norm_r)
    atol = tol * norm_r

    def cond(st):
        return (st[4] > atol) & (st[5] < max_iter)

    def body(st):
        x, r, p, rr, norm_r, k, res = st
        parity = k % 2
        p_hat = M(p)
        Ap = spmv_shard(A, p_hat)
        alpha = rr / inner(Ap, r_star, parity)
        s = r - alpha * Ap
        s_hat = M(s)
        As = spmv_shard(A, s_hat)
        omega = inner(As, s, parity) / inner(As, As, parity)
        x = x + alpha * p_hat + omega * s_hat
        r = s - omega * As
        rr_next = inner(r, r_star, parity)
        beta = (rr_next / rr) * (alpha / omega)
        p = r + beta * (p - omega * Ap)
        k = k + 1
        norm_r = norm2(r)
        res = res.at[k].set(norm_r)
        return x, r, p, rr_next, norm_r, k, res

    st = (x, r, p, rr, norm_r, jnp.array(0), res_hist)
    x, r, p, rr, norm_r, k, res = jax.lax.while_loop(cond, body, st)
    return x, res, k


from raptor_tpu.krylov._cache import RunCache, precond_key

# compiled-solver cache (see krylov/cg.py): bounded LRU
_RUN_CACHE = RunCache()


def bicgstab(mesh, A: DeviceParCSR, x0, b, tol: float = 1e-5,
             max_iter: Optional[int] = None, precond=None,
             inner_mode: str = "psum", norm_mode: str = "psum",
             partial: bool = False) -> BiCGStabResult:
    """``precond`` is the (data, specs, strip, apply) tuple from
    ``DeviceHierarchy.precond_pack()``."""
    if max_iter is None:
        max_iter = int(1.3 * A.global_num_rows) + 2

    pdata, pspecs = ((), ())
    if precond is not None:
        data, specs, strip, apply = precond
        pdata, pspecs = (data,), (specs,)

    tolv = jnp.asarray(tol, dtype=b.dtype)
    cache_key = ("bicgstab", mesh, max_iter, inner_mode, norm_mode,
                 partial, precond_key(precond))
    hit = _RUN_CACHE.get(cache_key)
    if hit is not None:
        return BiCGStabResult(*hit[0](A, x0, b, tolv, *pdata))

    @jax.jit
    def run(A, x0, b, tolv, *pd):
        def body(A, x0, b, tolv, *pd):
            A = jax.tree.map(lambda l: l[0], A)
            pfn = None
            if precond is not None:
                d = strip(pd[0])
                pfn = lambda x0_, r_: apply(d, x0_, r_)
            x, res, k = _bicgstab_shard(A, x0[0], b[0], tolv, max_iter,
                                        pfn, inner_mode, norm_mode,
                                        partial)
            return x[None], res, k

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=dpar.leaf_specs((A, x0, b)) + (P(),) + pspecs,
            out_specs=(P(ROW_AXIS, None), P(), P()))(A, x0, b, tolv, *pd)

    _RUN_CACHE.put(cache_key, (run, precond))
    return BiCGStabResult(*run(A, x0, b, tolv, *pdata))


# Named variants mirroring the reference API (par_bicgstab.hpp:14-27)
def seq_inner_bicgstab(mesh, A, x0, b, **kw):
    return bicgstab(mesh, A, x0, b, inner_mode="sequential", **kw)


def seq_norm_bicgstab(mesh, A, x0, b, **kw):
    return bicgstab(mesh, A, x0, b, norm_mode="sequential", **kw)


def seq_inner_seq_norm_bicgstab(mesh, A, x0, b, **kw):
    return bicgstab(mesh, A, x0, b, inner_mode="sequential",
                    norm_mode="sequential", **kw)


def pi_bicgstab(mesh, A, x0, b, **kw):
    return bicgstab(mesh, A, x0, b, partial=True, **kw)


def pre_bicgstab(mesh, A, x0, b, precond, **kw):
    return bicgstab(mesh, A, x0, b, precond=precond, **kw)


def pre_pi_bicgstab(mesh, A, x0, b, precond, **kw):
    return bicgstab(mesh, A, x0, b, precond=precond, partial=True, **kw)
