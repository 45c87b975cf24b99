"""Partial / sequential inner products as UNITS (the reference's
krylov/tests/test_partial_inner.cpp: half_inner/partial_inner values
against the exact dot, sequential_inner determinism)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from raptor_tpu.device import par as dpar
from raptor_tpu.krylov.bicgstab import (_make_partial_inner, _psum_inner,
                                        _seq_inner)


def _run_shard(fn, mesh, *arrays):
    out = jax.jit(lambda *a: jax.shard_map(
        fn, mesh=mesh, in_specs=tuple(P(dpar.ROW_AXIS, None)
                                      for _ in a),
        out_specs=P())(*a))(*arrays)
    return np.asarray(out)


@pytest.mark.parametrize("n_shards", [4, 8])
def test_half_inner_scaled_estimate(n_shards):
    """half_inner over either half estimates the dot scaled by the
    covered fraction (partial_inner.cpp:208-278): exact when both
    halves carry equal mass, both parities average to a sane value."""
    mesh = dpar.make_mesh(n_shards)
    n_loc = 64
    n = n_shards * n_loc
    rng = np.random.default_rng(5)
    x = rng.random((n_shards, n_loc))
    y = rng.random((n_shards, n_loc))
    exact = float((x * y).sum())

    for parity in (0, 1):
        def body(xs, ys, parity=parity):
            pin = _make_partial_inner(jnp.float64(n_loc), float(n))
            return pin(xs[0], ys[0], jnp.int32(parity))
        got = _run_shard(body, mesh, jnp.asarray(x), jnp.asarray(y))
        # the half-estimate is 2x the covered half's dot: it is an
        # APPROXIMATION of the full dot, within the mass imbalance
        lo, hi = 0.3 * exact, 1.7 * exact
        assert lo < float(got) < hi, (parity, float(got), exact)

    # constant vectors have equal mass per shard -> estimate is EXACT
    xc = np.ones((n_shards, n_loc))
    for parity in (0, 1):
        def body(xs, ys, parity=parity):
            pin = _make_partial_inner(jnp.float64(n_loc), float(n))
            return pin(xs[0], ys[0], jnp.int32(parity))
        got = _run_shard(body, mesh, jnp.asarray(xc), jnp.asarray(xc))
        np.testing.assert_allclose(float(got), float(n), rtol=1e-12)


def test_sequential_inner_deterministic_and_exact():
    """sequential_inner reproduces the shard-ordered summation exactly
    (partial_inner.cpp:103-137): equals the ordered NumPy per-shard
    cumsum bit-for-bit, and matches psum to roundoff."""
    for n_shards in (4, 8):
        mesh = dpar.make_mesh(n_shards)
        n_loc = 128
        rng = np.random.default_rng(11)
        x = rng.standard_normal((n_shards, n_loc))
        y = rng.standard_normal((n_shards, n_loc))

        def seq(xs, ys):
            return _seq_inner(xs[0], ys[0])

        def ps(xs, ys):
            return _psum_inner(xs[0], ys[0])

        got = _run_shard(seq, mesh, jnp.asarray(x), jnp.asarray(y))
        # bitwise repeatable (the point of the deterministic ordering)
        again = _run_shard(seq, mesh, jnp.asarray(x), jnp.asarray(y))
        assert float(got) == float(again)
        # and within ulps of the ordered per-shard oracle (the local
        # dot is XLA's own reduction, so exact bit-match with a NumPy
        # oracle is not defined — the ORDER across shards is)
        parts = np.array([float(jnp.vdot(jnp.asarray(x[s]),
                                         jnp.asarray(y[s])))
                          for s in range(n_shards)])
        ordered = np.cumsum(parts)[-1]
        np.testing.assert_allclose(float(got), ordered, rtol=1e-13)
        full = _run_shard(ps, mesh, jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(float(got), float(full), rtol=1e-12)
