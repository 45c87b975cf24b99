"""Jacobi prolongation smoothing
(aggregation/prolongation.cpp:6-58; parallel par_prolongation.cpp:8-186):
P = (I - w D~^{-1} A)^k T with D~ = |row sum of A| local weighting."""

from __future__ import annotations

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.types import ZERO_TOL


def jacobi_prolongation(a: CSRMatrix, t: CSRMatrix, omega: float = 4.0 / 3.0,
                        num_smooth_steps: int = 1) -> CSRMatrix:
    am = a.to_scipy()
    # note: the reference weights by |row sum| of the *signed* values
    # (prolongation.cpp:20-33: row_sum += fabs(vals) ... 1/fabs(row_sum))
    abs_row_sums = np.asarray(np.abs(am).sum(axis=1)).ravel()
    inv = np.where(abs_row_sums != 0.0, omega / np.abs(abs_row_sums), 0.0)
    import scipy.sparse as sp
    scaled_a = sp.diags(inv) @ am

    p = t.to_scipy()
    for _ in range(num_smooth_steps):
        ap = (scaled_a @ p).tocsr()
        ap.sum_duplicates()
        # reference SpGEMM drops |v| <= zero_tol (matmult.cpp:90-157)
        ap.data[np.abs(ap.data) <= ZERO_TOL] = 0.0
        ap.eliminate_zeros()
        p = (p - ap).tocsr()
    p.sort_indices()
    return CSRMatrix.from_scipy(p)
