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


def _row_scales(a_coo, n_rows, neg_diag):
    """Per-row max (where neg_diag) / min (else) of off-diagonal values."""
    off = a_coo.row != a_coo.col
    rows = a_coo.row[off]
    vals = a_coo.data[off]
    mx = np.full(n_rows, -np.inf)
    mn = np.full(n_rows, np.inf)
    np.maximum.at(mx, rows, vals)
    np.minimum.at(mn, rows, vals)
    return np.where(neg_diag, mx, mn)


def classical_strength(a: CSRMatrix, theta: float = 0.25,
                       num_variables: int = 1,
                       variables: np.ndarray = None) -> CSRMatrix:
    m = a.to_scipy().tocoo()
    n = a.n_rows
    diag = a.diagonal()
    neg = diag < 0.0

    if num_variables != 1:
        same_var = variables[m.row] == variables[m.col]
    else:
        same_var = np.ones(m.nnz, dtype=bool)

    # row scales over same-variable off-diagonals only
    off = (m.row != m.col) & same_var
    mx = np.full(n, -np.inf)
    mn = np.full(n, np.inf)
    np.maximum.at(mx, m.row[off], m.data[off])
    np.minimum.at(mn, m.row[off], m.data[off])
    scale = np.where(neg, mx, mn)
    thr = scale * theta

    is_diag = m.row == m.col
    strong = np.where(neg[m.row], m.data > thr[m.row], m.data < thr[m.row])
    keep = is_diag | ((m.row != m.col) & same_var & strong)

    s = sp.csr_matrix((m.data[keep], (m.row[keep], m.col[keep])),
                      shape=(n, a.n_cols))
    s.sort_indices()
    return CSRMatrix.from_scipy(s)


def symmetric_strength(a: CSRMatrix, theta: float = 0.25) -> CSRMatrix:
    m = a.to_scipy().tocoo()
    n = a.n_rows
    diag = a.diagonal()
    neg = diag < 0.0
    thr = _row_scales(m, n, neg) * theta

    is_diag = m.row == m.col
    strong_row = np.where(neg[m.row], m.data > thr[m.row],
                          m.data < thr[m.row])
    strong_col = np.where(neg[m.col], m.data > thr[m.col],
                          m.data < thr[m.col])
    keep = is_diag | (~is_diag & (strong_row | strong_col))

    s = sp.csr_matrix((m.data[keep], (m.row[keep], m.col[keep])),
                      shape=(n, a.n_cols))
    s.sort_indices()
    return CSRMatrix.from_scipy(s)


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
