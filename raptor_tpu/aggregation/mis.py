"""MIS(2) — distance-2 maximal independent set with random weights.

Faithful port of the reference's serial algorithm (aggregation/mis.cpp:8-220;
the parallel variant aggregation/par_mis.cpp:216 reproduces it given the same
weights). Host/setup-phase code by design.
"""

from __future__ import annotations

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.types import CFState

U = CFState.Unassigned
SEL = CFState.Selected
UNSEL = CFState.Unselected
TMP = CFState.TmpSelection
NEW_S = CFState.NewSelection
NEW_U = CFState.NewUnselection


def mis2(s: CSRMatrix, rand_vals: np.ndarray) -> np.ndarray:
    m = s.to_scipy()
    m.sort_indices()
    indptr, indices = m.indptr, m.indices
    n = s.n_rows
    r = np.asarray(rand_vals, dtype=np.float64)[:n]

    states = np.full(n, U, dtype=np.int64)

    from raptor_tpu import native
    if native.available():
        csc = m.tocsc()
        csc.sort_indices()
        native.mis2(m.indptr, m.indices, csc.indptr, csc.indices,
                    np.ascontiguousarray(r), states)
        return states

    # directed graph D: v -> col where r[v] > r[col] (mis.cpp:47-67)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    dmask = r[rows] > r[indices]
    import scipy.sparse as sp
    D = sp.csr_matrix((np.ones(int(dmask.sum())),
                       (rows[dmask], indices[dmask])), shape=(n, n))
    D.sort_indices()
    csc = m.tocsc()
    csc.sort_indices()

    V = list(range(n))
    C = np.zeros(n, dtype=np.int64)
    while V:
        # step 1: tentative selection — no D-neighbor unassigned/competing
        for v in V:
            dn = D.indices[D.indptr[v]:D.indptr[v + 1]]
            if not np.any((states[dn] == U) | (states[dn] > SEL)):
                states[v] = TMP
        # step 2: distance-2 competition by weight
        for v in V:
            if states[v] != TMP:
                continue
            found = False
            for w in indices[indptr[v]:indptr[v + 1]]:
                uu = indices[indptr[w]:indptr[w + 1]]
                if np.any((states[uu] > SEL) & (r[uu] > r[v])):
                    found = True
                    break
            if not found:
                states[v] = NEW_S
        # step 3: mark distance-1 in-neighborhood of new selections
        marked = []
        for v in V:
            if states[v] == NEW_S:
                for w in csc.indices[csc.indptr[v]:csc.indptr[v + 1]]:
                    if not C[w]:
                        C[w] = 1
                        marked.append(w)
        # step 4: unselect neighbors of new selections
        for v in V:
            if states[v] == NEW_S:
                continue
            nb = indices[indptr[v]:indptr[v + 1]]
            if np.any(states[nb] == NEW_S) or np.any(C[nb] == 1):
                states[v] = NEW_U
        for w in marked:
            C[w] = 0
        # step 5: finalize round
        keep = []
        for v in V:
            if states[v] == NEW_S:
                states[v] = SEL
            elif states[v] == NEW_U:
                states[v] = UNSEL
            else:
                keep.append(v)
        V = keep
    return states
