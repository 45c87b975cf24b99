"""Restarted GMRES(m), plain and AMG-preconditioned, fully on device.

The reference library stops at CG/BiCGStab; GMRES is the remaining
Krylov method production users of hypre-style stacks reach for on
nonsymmetric systems, so it is provided here beyond reference parity
with the same conventions as krylov/cg.py:
- ``res[k] = |g_{j+1}| / ||b||`` (the GMRES residual estimate; exact
  for the minimized residual), ``||b||`` clamped to 1 when ~0
- convergence on ``||r|| <= tol * ||r_0||``
- right preconditioning: the correction is ``M^{-1} (V y)``, so the
  REAL residual ``b - A x`` is minimized (one extra preconditioner
  apply per restart, no Z basis stored)

TPU-native formulation: the Arnoldi basis lives as one ``[m+1, S, R]``
buffer per shard; orthogonalization is classical Gram-Schmidt with one
reorthogonalization (CGS2) — two batched ``V^T w`` products (an einsum
+ psum) instead of the sequential MGS dot chain, the standard stable
choice when the basis product is the fast primitive.  Givens rotations
run as a replicated scalar fori_loop.  The whole solve is one
``shard_map`` + nested ``lax.while_loop``s: per inner iteration the
global communication is one halo exchange (SpMV) + two batched psums.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raptor_tpu.device import par as dpar
from raptor_tpu.device.par import DeviceParCSR, comm_axes, spmv_shard
from raptor_tpu.krylov._cache import RunCache, precond_key


class GMRESResult(NamedTuple):
    x: jnp.ndarray          # [S, R] solution
    res: jnp.ndarray        # [max_iter+1] relative residuals, -1 padded
    n_iters: jnp.ndarray    # scalar int (total inner iterations)


def _batched_dots(V, w):
    """[m+1] global inner products <V[i], w> in one psum."""
    local = jnp.einsum("i...,...->i", V, w)
    return jax.lax.psum(local, comm_axes())


def _gmres_shard(A: DeviceParCSR, x, b, tol, restart: int, max_iter: int,
                 precond=None, zero_tol: float = 1e-16):
    dtype = b.dtype
    m = restart
    b_norm = jnp.sqrt(jax.lax.psum(jnp.vdot(b, b), comm_axes()))
    b_norm = jnp.where(b_norm < zero_tol, 1.0, b_norm)

    r0 = b - spmv_shard(A, x)
    beta0 = jnp.sqrt(jax.lax.psum(jnp.vdot(r0, r0), comm_axes()))
    atol = tol * beta0
    res_hist = jnp.full(max_iter + 1, -1.0, dtype=dtype)
    res_hist = res_hist.at[0].set(beta0 / b_norm)

    def apply_M(v):
        return v if precond is None else precond(jnp.zeros_like(v), v)

    idx = jnp.arange(m + 1)

    def inner_body(st):
        V, H, cs, sn, g, j, k, res_hist, done = st
        vj = jax.lax.dynamic_index_in_dim(V, j, axis=0, keepdims=False)
        w = spmv_shard(A, apply_M(vj))
        # CGS2: project, reproject (mask rows > j — their V slots are 0
        # anyway, but the mask keeps H's unused entries exactly zero)
        mask = (idx <= j).astype(dtype)
        h = _batched_dots(V, w) * mask
        w = w - jnp.einsum("i,i...->...", h, V)
        h2 = _batched_dots(V, w) * mask
        w = w - jnp.einsum("i,i...->...", h2, V)
        h = h + h2
        hj1 = jnp.sqrt(jax.lax.psum(jnp.vdot(w, w), comm_axes()))
        lucky = hj1 < zero_tol
        V = jax.lax.dynamic_update_index_in_dim(
            V, w / jnp.where(lucky, 1.0, hj1), j + 1, axis=0)

        # column of H: previous Givens rotations, then the new one
        col = h.at[j + 1].set(hj1)

        def rot(i, c):
            ci, si = cs[i], sn[i]
            t0 = ci * c[i] + si * c[i + 1]
            t1 = -si * c[i] + ci * c[i + 1]
            hit = (i < j).astype(dtype)
            return (c.at[i].set(hit * t0 + (1 - hit) * c[i])
                     .at[i + 1].set(hit * t1 + (1 - hit) * c[i + 1]))

        col = jax.lax.fori_loop(0, m, rot, col)
        denom = jnp.sqrt(col[j] ** 2 + col[j + 1] ** 2)
        denom = jnp.where(denom < zero_tol, 1.0, denom)
        cj = col[j] / denom
        sj = col[j + 1] / denom
        col = col.at[j].set(cj * col[j] + sj * col[j + 1])
        col = col.at[j + 1].set(0.0)
        cs = cs.at[j].set(cj)
        sn = sn.at[j].set(sj)
        gj = g[j]
        g = g.at[j].set(cj * gj).at[j + 1].set(-sj * gj)
        H = jax.lax.dynamic_update_slice_in_dim(H, col[:, None], j,
                                                axis=1)
        resid = jnp.abs(g[j + 1])
        k = k + 1
        res_hist = res_hist.at[k].set(resid / b_norm)
        done = done | (resid <= atol) | lucky
        return V, H, cs, sn, g, j + 1, k, res_hist, done

    def inner_cond(st):
        _, _, _, _, _, j, k, _, done = st
        return (j < m) & (k < max_iter) & (~done)

    def outer_body(st):
        x, k, res_hist, done, prev_beta = st
        r = b - spmv_shard(A, x)
        beta = jnp.sqrt(jax.lax.psum(jnp.vdot(r, r), comm_axes()))
        safe = jnp.where(beta < zero_tol, 1.0, beta)
        V = jnp.zeros((m + 1,) + b.shape, dtype)
        V = V.at[0].set(r / safe)
        H = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)
        st_in = (V, H, cs, sn, g, jnp.array(0), k, res_hist,
                 done | (beta <= atol))
        V, H, cs, sn, g, j, k, res_hist, done = jax.lax.while_loop(
            inner_cond, inner_body, st_in)
        # back substitution on the j x j system; unused rows get an
        # identity diagonal and zero rhs so one padded solve serves all j
        live = jnp.arange(m) < j
        Hm = H[:m, :] * live[None, :] * live[:, None]
        Hm = Hm + jnp.diag(jnp.where(live, 0.0, 1.0).astype(dtype))
        y = jax.scipy.linalg.solve_triangular(Hm, g[:m] * live,
                                              lower=False)
        comb = jnp.einsum("i,i...->...", y, V[:m])
        x = x + apply_M(comb)
        # convergence is decided on the TRUE residual: in f32 the |g|
        # estimate drifts optimistic as orthogonality decays, so a
        # restart whose estimate converged but whose real residual
        # didn't keeps iterating (one extra SpMV per restart)
        rt = b - spmv_shard(A, x)
        beta_t = jnp.sqrt(jax.lax.psum(jnp.vdot(rt, rt), comm_axes()))
        # stagnation guardrail: a restart that improves the true
        # residual by <0.1% is at the precision floor (f32 cannot reach
        # arbitrary tolerances; the same rule as DeviceHierarchy.solve's
        # stall detection) — stop instead of burning max_iter restarts
        stalled = beta_t >= prev_beta * 0.999
        done = (beta_t <= atol) | stalled
        res_hist = res_hist.at[k].set(beta_t / b_norm)
        return x, k, res_hist, done, beta_t

    def outer_cond(st):
        _, k, _, done, _ = st
        return (k < max_iter) & (~done)

    st = (x, jnp.array(0), res_hist, beta0 <= atol, beta0)
    x, k, res_hist, _, _ = jax.lax.while_loop(outer_cond, outer_body, st)
    return x, res_hist, k


_RUN_CACHE = RunCache()


def gmres(mesh, A: DeviceParCSR, x0, b, tol: float = 1e-5,
          restart: int = 30, max_iter: Optional[int] = None,
          precond=None) -> GMRESResult:
    """Global restarted GMRES(m) solve.  ``precond``, if given, is the
    4-tuple from ``DeviceHierarchy.precond_pack()`` — AMG-preconditioned
    GMRES.  The Arnoldi basis costs ``(restart+1)`` vectors of device
    memory per shard."""
    if max_iter is None:
        max_iter = int(1.3 * A.global_num_rows) + 2

    pdata, pspecs = ((), ())
    if precond is not None:
        data, specs, strip, apply = precond
        pdata, pspecs = (data,), (specs,)

    tolv = jnp.asarray(tol, dtype=b.dtype)
    cache_key = ("gmres", mesh, restart, max_iter, precond_key(precond))
    hit = _RUN_CACHE.get(cache_key)
    if hit is not None:
        return GMRESResult(*hit[0](A, x0, b, tolv, *pdata))

    @jax.jit
    def run(A, x0, b, tolv, *pd):
        def body(A, x0, b, tolv, *pd):
            A = jax.tree.map(lambda l: l[0], A)
            pfn = None
            if precond is not None:
                d = strip(pd[0])
                pfn = lambda x0_, r_: apply(d, x0_, r_)
            x, res, k = _gmres_shard(A, x0[0], b[0], tolv, restart,
                                     max_iter, pfn)
            return x[None], res, k

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=dpar.leaf_specs((A, x0, b)) + (P(),) + pspecs,
            out_specs=(P(dpar.ROW_AXIS, None), P(), P()))(
                A, x0, b, tolv, *pd)

    _RUN_CACHE.put(cache_key, (run, precond))
    return GMRESResult(*run(A, x0, b, tolv, *pdata))
