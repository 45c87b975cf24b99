"""Galerkin-product sparsification (multilevel/par_sparsify.cpp:7-186,
arXiv:1512.04629): drop small Ac entries outside the minimal pattern
M = (AP)^T I + (AI)^T P, folding dropped values into the diagonal so row
sums are preserved."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.core.types import CFState


def injection_matrix(states: np.ndarray, partition=None) -> CSRMatrix:
    """I[i, coarse(i)] = 1 for C points (test_par_sparsify.cpp:96-113)."""
    n = len(states)
    sel = np.asarray(states) == CFState.Selected
    coarse_idx = np.cumsum(sel) - 1
    rows = np.nonzero(sel)[0]
    m = sp.csr_matrix((np.ones(len(rows)), (rows, coarse_idx[rows])),
                      shape=(n, int(sel.sum())))
    return CSRMatrix.from_scipy(m)


def sparsify(a: ParCSRMatrix, p: ParCSRMatrix, i_mat: CSRMatrix,
             ap: ParCSRMatrix, ac: ParCSRMatrix,
             theta: float, symmetric: bool = True) -> ParCSRMatrix:
    """Returns the sparsified coarse operator.

    ``symmetric=True`` (default, beyond the reference) keeps an entry if
    EITHER (i,j) or (j,i) survives the one-sided rule, so a symmetric Ac
    stays symmetric. The reference's row-wise drop
    (par_sparsify.cpp:7-186) makes the coarse operator nonsymmetric
    (measured |Ac - Ac^T| up to O(1) at theta=0.4 on 3-D PMIS+Extended),
    which breaks SPD smoothers (Chebyshev) and PCG — the source of the
    round-1 "sparsify diverges on 3-D PMIS+Extended" folklore. Set
    symmetric=False for the reference's exact behavior."""
    isp = i_mat.to_scipy()
    m1 = ap.global_csr.to_scipy().T @ isp
    ai = a.global_csr.to_scipy() @ isp
    m2 = ai.T @ p.global_csr.to_scipy()
    m_pat = (m1 + m2).tocsr()
    m_pat.sum_duplicates()

    acm = ac.global_csr.to_scipy().tocsr()
    acm.sort_indices()
    n = acm.shape[0]
    indptr, indices, data = acm.indptr, acm.indices, acm.data
    rows = np.repeat(np.arange(n), np.diff(indptr))
    offd = indices != rows

    # per-row off-diagonal max magnitude
    row_max = np.zeros(n)
    np.maximum.at(row_max, rows[offd], np.abs(data[offd]))

    # membership in the minimal pattern (vectorized by (row, col) key)
    mb = m_pat.tocsr()
    mb.sort_indices()
    mrows = np.repeat(np.arange(n), np.diff(mb.indptr))
    bkey = mrows.astype(np.int64) * acm.shape[1] + mb.indices
    akey = rows.astype(np.int64) * acm.shape[1] + indices
    pos = np.searchsorted(bkey, akey)
    pos = np.clip(pos, 0, max(0, len(bkey) - 1))
    in_m = (len(bkey) > 0) & (bkey[pos] == akey)

    keep = (~offd) | in_m | (np.abs(data) >= theta * row_max[rows])
    if symmetric:
        # an entry survives if its transpose partner does: OR the keep
        # mask with its transpose (pattern of Ac is symmetric for
        # symmetric A, so the mask aligns entry-by-entry)
        km = sp.csr_matrix((keep.astype(np.int8), indices, indptr),
                           shape=acm.shape)
        kmt = km.T.tocsr()
        kmt.sort_indices()
        if (np.array_equal(kmt.indptr, indptr)
                and np.array_equal(kmt.indices, indices)):
            keep = keep | (kmt.data > 0)
    dropped = ~keep
    # fold dropped values into the diagonal (row-sum preserving)
    diag_add = np.zeros(n)
    np.add.at(diag_add, rows[dropped], data[dropped])

    out = sp.csr_matrix((data[keep], (rows[keep], indices[keep])),
                        shape=acm.shape)
    out = (out + sp.diags(diag_add)).tocsr()
    out.sum_duplicates()
    out.sort_indices()
    return ParCSRMatrix(CSRMatrix.from_scipy(out), ac.partition)
