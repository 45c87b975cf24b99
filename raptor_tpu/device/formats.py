"""Device-resident sparse formats and their single-shard kernels.

The solve-phase sparse format is **transposed ELLPACK**: a CSR block is padded
to a fixed row width W and stored as ``cols``/``vals`` arrays of shape
[W, R] (row index on the 128-lane minor axis). SpMV is then W vectorized
gather-multiply-accumulate steps — fully static shapes, no data-dependent
control flow, exactly what XLA/TPU wants. Padding entries point at column 0
with value 0, so no masking is needed in the linear ops.

This replaces the reference's per-row CSR loops (util/linalg/spmv.cpp:59-265).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.core.matrix import CSRMatrix


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ell_arrays(a: CSRMatrix, rows_pad: int, width: int = None,
               lane_pad: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a CSR block into transposed-ELL [W, rows_pad] cols/vals."""
    row_nnz = np.diff(a.indptr)
    w = int(row_nnz.max()) if a.nnz else 0
    if width is None:
        width = max(1, w)
    assert w <= width, f"row width {w} exceeds requested {width}"
    rows_pad = _round_up(max(rows_pad, a.n_rows, 1), lane_pad)
    cols = np.zeros((width, rows_pad), dtype=np.int32)
    vals = np.zeros((width, rows_pad), dtype=np.float64)
    if a.nnz:
        rows = np.repeat(np.arange(a.n_rows), row_nnz)
        pos = np.arange(a.nnz) - np.repeat(a.indptr[:-1], row_nnz)
        cols[pos, rows] = a.indices
        vals[pos, rows] = a.data
    return cols, vals


def ell_spmv(cols: jnp.ndarray, vals: jnp.ndarray,
             x: jnp.ndarray) -> jnp.ndarray:
    """b[r] = sum_w vals[w,r] * x[cols[w,r]] — padded entries contribute 0."""
    return (vals * x[cols]).sum(axis=0)


def ell_spmv_T(cols: jnp.ndarray, vals: jnp.ndarray, x: jnp.ndarray,
               n_out: int) -> jnp.ndarray:
    """b = A^T x for an ELL block: scatter-add vals[w,r]*x[r] at cols[w,r].

    Padding has vals 0, so it adds 0 at position 0 — harmless.
    """
    contrib = vals * x[None, :]
    return jnp.zeros(n_out, dtype=x.dtype).at[cols.reshape(-1)].add(
        contrib.reshape(-1))


# --- boundary-compacted off_proc block ----------------------------------------
#
# Off-proc (halo) entries only exist on the shard-boundary rows — a surface,
# not a volume. Storing the off block ELL over ALL rows makes its SpMV a
# full-R gather (TPU gathers are ~100x slower than streaming ops), which
# would dominate the whole solve. Instead the off block is compacted to the
# B boundary rows: gather/scatter cost scales with the halo surface.

def ell_boundary_arrays(a: CSRMatrix, width: int, b_pad: int,
                        rows_pad: int):
    """Pack a CSR block into boundary-compacted ELL.

    Returns (rows [b_pad] int32, cols [width, b_pad] int32,
    vals [width, b_pad]). Row padding slots hold ``rows_pad`` (out of
    bounds: scatter-dropped, and their vals are 0 so clamped gathers
    contribute nothing)."""
    row_nnz = np.diff(a.indptr)
    brows = np.nonzero(row_nnz)[0]
    rows = np.full(b_pad, rows_pad, dtype=np.int32)
    cols = np.zeros((width, b_pad), dtype=np.int32)
    vals = np.zeros((width, b_pad), dtype=np.float64)
    if len(brows):
        rows[:len(brows)] = brows
        bn = row_nnz[brows]
        rpos = np.repeat(np.arange(len(brows)), bn)
        pos = np.arange(a.nnz) - np.repeat(a.indptr[brows], bn)
        cols[pos, rpos] = a.indices
        vals[pos, rpos] = a.data
    return rows, cols, vals


def off_spmv(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
             halo: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """b = A_off @ halo over boundary rows only; returns a full [n_rows]
    vector (zeros elsewhere)."""
    out = jnp.zeros(n_rows, dtype=halo.dtype)
    if cols.size == 0:
        return out
    contrib = (vals * halo[cols]).sum(axis=0)           # [B]
    return out.at[rows].add(contrib)                    # OOB pads dropped


def off_spmv_T(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
               x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """halo_contrib = A_off^T x: gather x at boundary rows, scatter-add at
    halo cols."""
    if cols.size == 0:
        return jnp.zeros(n_out, dtype=x.dtype)
    xb = x[rows]                                        # clamped pads * 0
    contrib = vals * xb[None, :]
    return jnp.zeros(n_out, dtype=x.dtype).at[cols.reshape(-1)].add(
        contrib.reshape(-1))


# --- DIA (diagonal) format -----------------------------------------------------
#
# XLA's generic gather is catastrophically slow on TPU (~1000x an elementwise
# op), but the matrices AMG spends its time on — stencil operators and their
# shard-local blocks — have a handful of distinct (col - row) offsets. Storing
# those diagonals densely turns SpMV into K shift-multiply-accumulate sweeps:
# pure VPU streaming at HBM bandwidth, zero gathers. This is the TPU-native
# answer to the reference's CSR row loop (util/linalg/spmv.cpp:59).

def dia_detect(a: CSRMatrix, max_offsets: int) -> np.ndarray:
    """Distinct col-row offsets, or None if the block is not DIA-friendly."""
    if a.nnz == 0:
        return np.zeros(0, dtype=np.int64)
    rows = np.repeat(np.arange(a.n_rows), np.diff(a.indptr))
    offs = np.unique(a.indices - rows)
    if len(offs) > max_offsets:
        return None
    return offs


def dia_arrays(a: CSRMatrix, offsets: np.ndarray,
               rows_pad: int) -> np.ndarray:
    """Pack CSR into DIA vals [K, rows_pad] against the (static) offset set:
    vals[k, i] = A[i, i + offsets[k]] (0 where absent)."""
    K = len(offsets)
    vals = np.zeros((K, rows_pad), dtype=np.float64)
    if a.nnz:
        rows = np.repeat(np.arange(a.n_rows), np.diff(a.indptr))
        entry_offs = a.indices - rows
        k_of = np.searchsorted(offsets, entry_offs)
        assert np.array_equal(np.asarray(offsets)[k_of], entry_offs)
        vals[k_of, rows] = a.data
    return vals


def dia_spmv(offsets: Tuple[int, ...], vals: jnp.ndarray, x: jnp.ndarray,
             pad: int) -> jnp.ndarray:
    """b[i] = sum_k vals[k,i] * x[i + offsets[k]].

    ``offsets`` are STATIC (trace-time) — the per-shard diagonal sets are
    padded to their union at setup, so every shard runs the same program and
    every shifted read is a static ``lax.slice`` that XLA fuses into one
    streaming multiply-accumulate pass (no gathers, no dynamic slices)."""
    R = vals.shape[1]
    x_pad = jnp.pad(x, (pad, pad + max(0, R - x.shape[0])))
    b = jnp.zeros(R, dtype=x.dtype)
    for k, off in enumerate(offsets):
        b = b + vals[k] * jax.lax.slice(x_pad, (off + pad,),
                                        (off + pad + R,))
    return b


def dia_spmv_T(offsets: Tuple[int, ...], vals: jnp.ndarray, x: jnp.ndarray,
               n_out: int, pad: int) -> jnp.ndarray:
    """b[i + offsets[k]] += vals[k, i] * x[i] — static shifted accumulation:
    each diagonal's contribution is zero-padded into alignment and summed."""
    R = vals.shape[1]
    width = 2 * pad + max(R, n_out)
    buf = jnp.zeros(width, dtype=x.dtype)
    for k, off in enumerate(offsets):
        contrib = vals[k] * x[:R]
        buf = buf + jnp.pad(contrib, (off + pad, width - (off + pad) - R))
    return buf[pad:pad + n_out]
