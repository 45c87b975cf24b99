"""CF splitting: Ruge-Stuben, CLJP, PMIS, Falgout, HMIS.

Faithful reimplementations of the reference's algorithms
(ruge_stuben/cf_splitting.cpp, ruge_stuben/par_cf_splitting.cpp:60-163),
run globally on the host at setup time. Given the same strength matrix and
the same random weights (test_data/weights.txt), the reference's parallel
variants reproduce the serial results independent of rank count — so a
global implementation is both golden-exact and shard-count-invariant.

These are inherently sequential graph algorithms (bucket queues, frontier
sweeps); they live on the host by design — the device consumes only the
resulting splitting vector. State constants follow core/types.hpp:29-35
(Selected=1, Unselected=0, Unassigned=-1, NoNeighbors=-2).
"""

from __future__ import annotations

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.types import CFState

U, S_, F = CFState.Unassigned, CFState.Selected, CFState.Unselected
NEW_C = CFState.NewSelection


def _strip_diag(s: CSRMatrix):
    """CSR arrays of S without diagonal entries (the reference skips the
    diag-first entry in every loop; stripping once is equivalent).
    In-order selection -- no COO round trip, no re-sort."""
    indptr = np.asarray(s.indptr, dtype=np.int64)
    indices = np.asarray(s.indices, dtype=np.int64)
    rows_all = np.repeat(np.arange(s.n_rows, dtype=np.int64),
                         np.diff(indptr))
    off = indices != rows_all
    kept = np.concatenate(([0], np.cumsum(off, dtype=np.int64)))
    return kept[indptr], np.ascontiguousarray(indices[off])


def _pattern(s: CSRMatrix):
    """(indptr, indices, col_ptr, col_indices) of the diag-stripped S --
    computed ONCE per splitting call; the multi-stage entry points
    (HMIS/Falgout) reuse it across their stages (at 128^3 the strip +
    transpose cost seconds each and used to run 2-3x per split)."""
    from raptor_tpu import native
    if native.available():
        return native.split_pattern(s.indptr, s.indices, s.n_rows,
                                    s.n_cols)
    indptr, indices = _strip_diag(s)
    col_ptr, col_indices = _transpose_pattern(indptr, indices, s.n_rows,
                                              s.n_cols)
    return indptr, indices, col_ptr, col_indices


def _transpose_pattern(indptr, indices, n_rows, n_cols):
    """CSC pattern (col_ptr, col_indices) of the diag-stripped S
    (cf_splitting.cpp:33-91)."""
    import scipy.sparse as sp
    m = sp.csr_matrix((np.ones(len(indices)), indices, indptr),
                      shape=(n_rows, n_cols)).tocsc()
    m.sort_indices()
    return m.indptr, m.indices


def set_initial_states(s: CSRMatrix, pattern=None) -> np.ndarray:
    """Rows with no off-diagonal strong connections get NoNeighbors
    (par_cf_splitting.cpp:165-183)."""
    indptr = pattern[0] if pattern is not None else _strip_diag(s)[0]
    states = np.full(s.n_rows, U, dtype=np.int64)
    states[np.diff(indptr) == 0] = CFState.NoNeighbors
    return states


def rs_first_pass(indptr, indices, col_ptr, col_indices, weights, states):
    """Classical RS first pass with the reference's bucket-queue order
    (cf_splitting.cpp:92-232). Sequential by construction; order and
    tie-breaking must match exactly for golden parity."""
    n = len(weights)
    weight_sizes = np.zeros(n + 1, dtype=np.int64)
    for w in weights:
        weight_sizes[w] += 1
    weight_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(weight_sizes[:-1], out=weight_ptr[1:])
    weight_sizes[:] = 0
    weight_idx_to_col = np.zeros(n, dtype=np.int64)
    col_to_weight_idx = np.zeros(n, dtype=np.int64)
    for i in range(n):
        w = weights[i]
        idx = weight_ptr[w] + weight_sizes[w]
        weight_sizes[w] += 1
        weight_idx_to_col[idx] = i
        col_to_weight_idx[i] = idx

    for i in range(n - 1, -1, -1):
        col = weight_idx_to_col[i]
        w = weights[col]
        weight_sizes[w] -= 1
        if states[col] != U:
            continue
        states[col] = S_
        # nodes influenced by col become F; their strong neighbors gain
        for idx in col_indices[col_ptr[col]:col_ptr[col + 1]]:
            if states[idx] != U:
                continue
            states[idx] = F
            for idx_k in indices[indptr[idx]:indptr[idx + 1]]:
                if states[idx_k] != U:
                    continue
                wk = weights[idx_k]
                if wk >= n - 1:
                    continue
                old_pos = col_to_weight_idx[idx_k]
                new_pos = weight_ptr[wk] + weight_sizes[wk] - 1
                a, b = weight_idx_to_col[old_pos], weight_idx_to_col[new_pos]
                col_to_weight_idx[a] = new_pos
                col_to_weight_idx[b] = old_pos
                weight_idx_to_col[old_pos] = b
                weight_idx_to_col[new_pos] = a
                weight_sizes[wk] -= 1
                weight_sizes[wk + 1] += 1
                weight_ptr[wk + 1] = new_pos
                weights[idx_k] += 1
        # strong neighbors of col lose influence
        for idx in indices[indptr[col]:indptr[col + 1]]:
            if states[idx] != U:
                continue
            w2 = weights[idx]
            if w2 == 0:
                continue
            old_pos = col_to_weight_idx[idx]
            new_pos = weight_ptr[w2]
            a, b = weight_idx_to_col[old_pos], weight_idx_to_col[new_pos]
            col_to_weight_idx[a] = new_pos
            col_to_weight_idx[b] = old_pos
            weight_idx_to_col[old_pos] = b
            weight_idx_to_col[new_pos] = a
            weight_sizes[w2] -= 1
            weight_sizes[w2 - 1] += 1
            weight_ptr[w2] += 1
            weight_ptr[w2 - 1] = weight_ptr[w2] - weight_sizes[w2 - 1]
            weights[idx] -= 1


def rs_second_pass(s: CSRMatrix, states):
    """F-F links without a common C neighbor force one endpoint coarse
    (cf_splitting.cpp:234-284). Uses the FULL (diag-included) pattern."""
    indptr, indices = s.indptr, s.indices
    row_coarse = np.full(s.n_rows, -1, dtype=np.int64)
    for i in range(s.n_rows):
        if states[i] == S_:
            continue
        row = indices[indptr[i]:indptr[i + 1]]
        for col in row:
            if states[col] == S_:
                row_coarse[col] = i
        for col in row:
            if states[col] != F:
                continue
            sk, ek = indptr[col], indptr[col + 1]
            if sk == ek:
                continue
            if not np.any(row_coarse[indices[sk:ek]] == i):
                row_coarse[col] = i
                states[col] = S_


def split_rs(s: CSRMatrix, states=None, second_pass: bool = True,
             pattern=None):
    """split_rs (cf_splitting.cpp:300-341)."""
    if states is None:
        states = np.full(s.n_rows, U, dtype=np.int64)
    indptr, indices, col_ptr, col_indices = (pattern if pattern is not None
                                             else _pattern(s))
    weights = np.diff(col_ptr).astype(np.int64)
    from raptor_tpu import native
    if native.available():
        native.rs_first_pass(indptr, indices, col_ptr, col_indices,
                             weights, states)
        if second_pass:
            native.rs_second_pass(s.indptr, s.indices, states)
        return states
    rs_first_pass(indptr, indices, col_ptr, col_indices, weights, states)
    if second_pass:
        rs_second_pass(s, states)
    return states


def _select_independent_set(indptr, indices, col_ptr, col_indices,
                            unassigned, states, weights, new_coarse_list):
    """Nodes whose weight strictly dominates all strong neighbors
    (cf_splitting.cpp:343-404)."""
    n_new = 0
    for u in unassigned:
        w = weights[u]
        if np.any(weights[indices[indptr[u]:indptr[u + 1]]] > w):
            continue
        if np.any(weights[col_indices[col_ptr[u]:col_ptr[u + 1]]] > w):
            continue
        states[u] = NEW_C
        new_coarse_list[n_new] = u
        n_new += 1
    return n_new


def _update_states(unassigned, states, weights):
    """(cf_splitting.cpp:475-500)."""
    keep = []
    for u in unassigned:
        if states[u] == NEW_C:
            weights[u] = 0.0
            states[u] = S_
        elif weights[u] < 1.0:
            weights[u] = 0.0
            states[u] = F
        else:
            keep.append(u)
    return keep


def cljp_main_loop(s: CSRMatrix, states, rand_vals, pattern=None):
    """(cf_splitting.cpp:502-577). ``edgemark`` tracks S edges not yet
    accounted for; ``c_dep_cache`` zero-initialized like the reference's
    value-initialized vector."""
    n = s.n_rows
    indptr, indices, col_ptr, col_indices = (pattern if pattern is not None
                                             else _pattern(s))
    nnz = len(indices)
    weights = np.ascontiguousarray(rand_vals[:n], dtype=np.float64).copy()
    weights += np.bincount(indices, minlength=n)  # strong-graph in-degree
    # (bincount == add.at here: integer counts added once per node)

    from raptor_tpu import native
    if native.available():
        native.cljp_main_loop(indptr, indices, col_ptr, col_indices,
                              states, weights)
        return states

    edgemark = np.ones(nnz, dtype=np.int64)
    c_dep_cache = np.zeros(n, dtype=np.int64)

    unassigned = [i for i in range(n) if states[i] == U]
    new_coarse_list = np.zeros(n, dtype=np.int64)
    while unassigned:
        n_new = _select_independent_set(indptr, indices, col_ptr,
                                        col_indices, unassigned, states,
                                        weights, new_coarse_list)
        # update_weights (cf_splitting.cpp:406-473)
        for c in new_coarse_list[:n_new]:
            for j in range(indptr[c], indptr[c + 1]):
                idx = indices[j]
                if states[idx] == U and edgemark[j]:
                    edgemark[j] = 0
                    weights[idx] -= 1
        for c in new_coarse_list[:n_new]:
            cs, ce = col_ptr[c], col_ptr[c + 1]
            for idx in col_indices[cs:ce]:
                if states[idx] == U:
                    c_dep_cache[idx] = c
            for idx in col_indices[cs:ce]:
                if states[idx] == S_:
                    continue
                for k in range(indptr[idx], indptr[idx + 1]):
                    idx_k = indices[k]
                    if (states[idx_k] == U and edgemark[k]
                            and c_dep_cache[idx_k] == c):
                        edgemark[k] = 0
                        weights[idx_k] -= 1
        unassigned = _update_states(unassigned, states, weights)
    return states


def pmis_main_loop(s: CSRMatrix, states, rand_vals, pattern=None):
    """(cf_splitting.cpp:578-665)."""
    n = s.n_rows
    indptr, indices, col_ptr, col_indices = (pattern if pattern is not None
                                             else _pattern(s))
    weights = np.ascontiguousarray(rand_vals[:n], dtype=np.float64).copy()
    weights += np.bincount(indices, minlength=n)

    from raptor_tpu import native
    if native.available():
        native.pmis_main_loop(indptr, indices, col_ptr, col_indices,
                              states, weights)
        return states

    unassigned = []
    for i in range(n):
        if states[i] != U:
            continue
        if weights[i] < 1:
            states[i] = F
        else:
            unassigned.append(i)

    new_coarse_list = np.zeros(n, dtype=np.int64)
    while unassigned:
        n_new = _select_independent_set(indptr, indices, col_ptr,
                                        col_indices, unassigned, states,
                                        weights, new_coarse_list)
        for c in new_coarse_list[:n_new]:
            for row in col_indices[col_ptr[c]:col_ptr[c + 1]]:
                if states[row] == U:
                    states[row] = F
                    weights[row] = 0
        unassigned = _update_states(unassigned, states, weights)
    return states


# --- entry points (par_cf_splitting.cpp:60-163 equivalents) -----------------

def split_cljp(s, rand_vals, states=None):
    s, par = _unwrap(s)
    pat = _pattern(s)
    if states is None:
        states = set_initial_states(s, pattern=pat)
    return cljp_main_loop(s, states, rand_vals, pattern=pat)


def split_pmis(s, rand_vals, states=None):
    s, par = _unwrap(s)
    pat = _pattern(s)
    if states is None:
        states = set_initial_states(s, pattern=pat)
    return pmis_main_loop(s, states, rand_vals, pattern=pat)


def split_rs_entry(s, states=None):
    """split_rs parallel entry (par_cf_splitting.cpp:60-83): initial states
    then the serial RS pass over the (global) matrix."""
    s, par = _unwrap(s)
    pat = _pattern(s)
    if states is None:
        states = set_initial_states(s, pattern=pat)
    return split_rs(s, states, pattern=pat)


def split_falgout(s, rand_vals, states=None):
    """RS everywhere, then CLJP on shard-boundary rows
    (par_cf_splitting.cpp:103-126). Globally there are no boundary rows,
    so this reduces to RS — exactly the reference's 1-rank behavior."""
    s, par = _unwrap(s)
    pat = _pattern(s)
    if states is None:
        states = set_initial_states(s, pattern=pat)
    states = split_rs(s, states, pattern=pat)
    return cljp_main_loop(s, states, rand_vals, pattern=pat)


def split_hmis(s, rand_vals, states=None):
    """RS first pass, then PMIS on boundary rows
    (par_cf_splitting.cpp:142-163); globally = RS first pass + PMIS over
    the remaining unassigned."""
    s, par = _unwrap(s)
    pat = _pattern(s)
    if states is None:
        states = set_initial_states(s, pattern=pat)
    states = split_rs(s, states, second_pass=False, pattern=pat)
    return pmis_main_loop(s, states, rand_vals, pattern=pat)


def _unwrap(s):
    if isinstance(s, ParCSRMatrix):
        return s.global_csr, s
    return s, None
