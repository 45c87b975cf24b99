"""Krylov per-phase time splits — the reference's ``comm_t``/
``precond_t`` out-params (krylov/par_cg.cpp:121-239, par_bicgstab.cpp).

The reference brackets MPI calls and the preconditioner application with
wall-clock timers inside the iteration. Here the whole iteration is one
jitted while_loop, so the split is measured component-wise with the
chained-timing method (long-vs-short jitted fori_loop chains, so
per-dispatch latency cancels — the only robust way through a
remote-execution relay):

- ``comm_t``: one halo exchange (the SpMV's collective) per iteration
  plus the two psum reductions of the inner products
- ``precond_t``: one V-cycle application
- ``spmv_t``: the full SpMV (on_proc compute + halo exchange + off_proc)
- ``total_t``: one full PCG iteration

All figures are seconds per iteration; ``comm_t`` on a single chip
measures the collective's dispatch floor (the ICI wire time appears on
real multi-chip meshes).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from raptor_tpu.device import par as dpar
from raptor_tpu.device.par import dot_shard, halo_exchange, spmv_shard

N_LO, N_HI, REPS = 2, 42, 3


def _per_iter(chain, *args):
    float(chain(*args, N_LO))
    float(chain(*args, N_HI))

    def timed(n):
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(chain(*args, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return max(0.0, (timed(N_HI) - timed(N_LO)) / (N_HI - N_LO))


def pcg_time_split(mesh, A, b, precond=None) -> dict:
    """Per-iteration time split of (preconditioned) CG on ``A``
    (DeviceParCSR) with rhs vector ``b`` ([S, R] device array).
    Returns {"total_t", "spmv_t", "comm_t", "precond_t"} in seconds."""
    from jax.sharding import PartitionSpec as P
    ax = dpar._leading_axes(mesh)

    pdata, pspecs = ((), ())
    strip = apply = None
    if precond is not None:
        data, specs, strip, apply = precond
        pdata, pspecs = (data,), (specs,)

    def shard_chain(kind):
        def body_fn(A, x, pd):
            if kind == "comm":
                h = halo_exchange(A, x[:A.cols_pad])
                s = jnp.sum(h) + dot_shard(x, x) + dot_shard(x, x + 1.0)
                return x + s * 1e-30
            if kind == "spmv":
                y = spmv_shard(A, x)
                return y / jnp.max(jnp.abs(y))
            if kind == "precond":
                d = strip(pd[0])
                y = apply(d, jnp.zeros_like(x), x)
                return y / jnp.max(jnp.abs(y))
            # full PCG iteration body (alpha/beta recurrences + 1 spmv
            # + 2 reductions + optional precond)
            Ap = spmv_shard(A, x)
            app = dot_shard(Ap, x)
            alpha = dot_shard(x, x) / app
            r = x - alpha * Ap
            if apply is not None:
                d = strip(pd[0])
                z = apply(d, jnp.zeros_like(r), r)
            else:
                z = r
            beta = dot_shard(r, z) / app
            y = z + beta * x
            return y / jnp.max(jnp.abs(y))

        def run(A, x, *pd, n=2):
            def chain(A, x, pd, n):
                return jnp.sum(jax.lax.fori_loop(
                    0, n, lambda _, v: body_fn(A, v, pd), x))

            def body(A, x, *pd):
                As = jax.tree.map(lambda l: l[0], A)
                return chain(As, x[0], pd, n)[None]

            return jnp.sum(jax.shard_map(
                body, mesh=mesh,
                in_specs=dpar.leaf_specs((A, b)) + pspecs,
                out_specs=P(ax))(A, x, *pd))

        return run

    out = {}
    with dpar.use_comm_axes(ax):
        for kind, name in (("iter", "total_t"), ("spmv", "spmv_t"),
                           ("comm", "comm_t"), ("precond", "precond_t")):
            if kind == "precond" and precond is None:
                out[name] = 0.0
                continue
            run = shard_chain(kind)
            jitted = jax.jit(
                lambda A, x, *pd, _r=run, n=2: _r(A, x, *pd, n=n),
                static_argnames=("n",))
            out[name] = _per_iter(
                lambda A, x, *pd_n: jitted(A, x, *pd_n[:-1],
                                           n=pd_n[-1]),
                A, b, *pdata)
    return out
