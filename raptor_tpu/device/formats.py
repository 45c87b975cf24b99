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
