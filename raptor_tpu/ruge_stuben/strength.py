"""Strength of connection.

Vectorized NumPy equivalents of the reference's row loops:
- classical (hypre-compatible) strength: strength.cpp:12-198 /
  par_strength.cpp:14-346. Diagonal always kept. If a_ii < 0 the row scale is
  the max off-diag value and entries with ``val > theta*scale`` are strong;
  otherwise the min off-diag value and ``val < theta*scale`` (strict).
- symmetric (SA) strength: strength.cpp:200-325 — an off-diag entry is kept
  if it is strong in its row OR by the threshold of its column's row.

S keeps A's values on the kept pattern.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.types import StrengthType


def _seg_minmax(rows, vals, n):
    """Per-row (min, max) of ``vals`` grouped by the SORTED ``rows`` array
    (CSR-order COO), via reduceat — much faster than ufunc.at."""
    counts = np.bincount(rows, minlength=n)
    starts = np.cumsum(counts) - counts
    ne = counts > 0
    mx = np.full(n, -np.inf)
    mn = np.full(n, np.inf)
    if rows.size:
        mx[ne] = np.maximum.reduceat(vals, starts[ne])
        mn[ne] = np.minimum.reduceat(vals, starts[ne])
    return mn, mx


def _row_scales(a_coo, n_rows, neg_diag):
    """Per-row max (where neg_diag) / min (else) of off-diagonal values."""
    off = a_coo.row != a_coo.col
    mn, mx = _seg_minmax(a_coo.row[off], a_coo.data[off], n_rows)
    return np.where(neg_diag, mx, mn)


def classical_strength(a: CSRMatrix, theta: float = 0.25,
                       num_variables: int = 1,
                       variables: np.ndarray = None) -> CSRMatrix:
    from raptor_tpu import native
    if native.available():
        # single fused threshold+compress pass (bit-identical to the
        # NumPy path below, which remains the oracle/fallback; the
        # mask+filter_entries route paid a cumsum and two nnz-sized
        # gathers on top)
        indptr, indices, data = native.classical_strength_csr(
            a.indptr, a.indices, a.data, theta,
            variables if num_variables != 1 else None, num_variables)
        # (in-row order is inherited from A; sortedness is computed
        # lazily by has_sorted_indices when needed)
        return CSRMatrix(a.n_rows, a.n_cols, indptr, indices, data)
    n = a.n_rows
    rows, cols, data = a.row_ids(), a.indices, a.data
    diag = a.diagonal()
    neg = diag < 0.0

    if num_variables != 1:
        same_var = variables[rows] == variables[cols]
    else:
        same_var = np.ones(len(data), dtype=bool)

    # row scales over same-variable off-diagonals only
    is_diag = rows == cols
    off = ~is_diag & same_var
    mn, mx = _seg_minmax(rows[off], data[off], n)
    scale = np.where(neg, mx, mn)
    thr = scale * theta

    strong = np.where(neg[rows], data > thr[rows], data < thr[rows])
    keep = is_diag | (~is_diag & same_var & strong)
    return a.filter_entries(keep)


def symmetric_strength(a: CSRMatrix, theta: float = 0.25) -> CSRMatrix:
    from raptor_tpu import native
    if native.available():
        indptr, indices, data = native.symmetric_strength_csr(
            a.indptr, a.indices, a.data, theta)
        return CSRMatrix(a.n_rows, a.n_cols, indptr, indices, data)
    n = a.n_rows
    rows, cols, data = a.row_ids(), a.indices, a.data
    diag = a.diagonal()
    neg = diag < 0.0

    is_diag = rows == cols
    mn, mx = _seg_minmax(rows[~is_diag], data[~is_diag], n)
    thr = np.where(neg, mx, mn) * theta

    strong_row = np.where(neg[rows], data > thr[rows], data < thr[rows])
    strong_col = np.where(neg[cols], data > thr[cols], data < thr[cols])
    keep = is_diag | (~is_diag & (strong_row | strong_col))
    return a.filter_entries(keep)


def strength(a, strength_type: StrengthType = StrengthType.Classical,
             theta: float = 0.25, num_variables: int = 1,
             variables: np.ndarray = None):
    """Dispatch (CSRMatrix::strength, strength.cpp:328 /
    ParCSRMatrix::strength, par_strength.cpp:541)."""
    if isinstance(a, ParCSRMatrix):
        s = strength(a.global_csr, strength_type, theta, num_variables,
                     variables)
        return ParCSRMatrix(s, a.partition)
    if strength_type == StrengthType.Classical:
        return classical_strength(a, theta, num_variables, variables)
    return symmetric_strength(a, theta)
