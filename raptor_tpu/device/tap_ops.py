"""Topology-aware SpMV entry points on a 2-D (host, local) mesh.

The TAP analog of util/linalg/par_spmv.cpp:61-89 (``tap_mult``) and
:157-209 (``tap_mult_T``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raptor_tpu.comm.tap import (
    DeviceTAP, HOST_AXIS, LOCAL_AXIS, tap_halo_exchange, tap_halo_exchange_T)
from raptor_tpu.device.formats import off_spmv, off_spmv_T
from raptor_tpu.device.par import (
    DeviceParCSR, on_spmv_shard, on_spmv_T_shard)


def tap_spmv_shard(A: DeviceParCSR, T: DeviceTAP, x: jnp.ndarray):
    halo = tap_halo_exchange(T, x)
    return on_spmv_shard(A, x) + off_spmv(A.off_rows, A.off_cols,
                                          A.off_vals, halo, A.rows_pad)


def tap_spmv_T_shard(A: DeviceParCSR, T: DeviceTAP, x: jnp.ndarray):
    out = on_spmv_T_shard(A, x)
    halo_contrib = off_spmv_T(A.off_rows, A.off_cols, A.off_vals, x,
                              A.halo_pad)
    return out + tap_halo_exchange_T(T, halo_contrib, A.cols_pad)


def _specs(tree):
    return jax.tree.map(
        lambda l: P((HOST_AXIS, LOCAL_AXIS),
                    *([None] * (jnp.ndim(l) - 1))), tree)


def _run(mesh, shard_fn, A, T, x):
    def body(A, T, x):
        A = jax.tree.map(lambda l: l[0], A)
        T = jax.tree.map(lambda l: l[0], T)
        return shard_fn(A, T, x[0])[None]

    return jax.jit(lambda A, T, x: jax.shard_map(
        body, mesh=mesh, in_specs=_specs((A, T, x)),
        out_specs=P((HOST_AXIS, LOCAL_AXIS), None))(A, T, x))(A, T, x)


def tap_spmv(mesh, A: DeviceParCSR, T: DeviceTAP, x):
    return _run(mesh, tap_spmv_shard, A, T, x)


def tap_spmv_T(mesh, A: DeviceParCSR, T: DeviceTAP, x):
    return _run(mesh, tap_spmv_T_shard, A, T, x)
