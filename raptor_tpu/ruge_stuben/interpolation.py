"""Classical AMG interpolation: direct and modified-classical (hypre-style).

Reimplementations of the reference's serial row algorithms
(ruge_stuben/interpolation.cpp:443 ``direct_interpolation``,
:206 ``mod_classical_interpolation``), run globally on the host. The parallel
versions (ruge_stuben/par_interpolation.cpp:1474, :1012) produce identical
results given the same splitting, so a global implementation is golden-exact
and shard-count invariant. ``filter_interp`` mirrors
par_interpolation.cpp:196 (used after PMIS/HMIS + Extended).
"""

from __future__ import annotations

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.core.types import CFState, ZERO_TOL

S_, F = CFState.Selected, CFState.Unselected


def _coarse_map(states):
    """Global col -> coarse col index for Selected points."""
    sel = states == S_
    col_to_new = np.cumsum(sel) - 1
    return np.where(sel, col_to_new, -1), int(sel.sum())


def _mark_strong(am, sm) -> np.ndarray:
    """Boolean mask over A's data positions that appear in S's pattern
    (both CSR, sorted indices). S's pattern must be a subset of A's."""
    from raptor_tpu import native
    if native.available():
        return native.mark_strong(am.indptr, am.indices, sm.indptr,
                                  sm.indices, am.shape[0]).astype(bool)
    strong_mask = np.zeros(len(am.indices), dtype=bool)
    for i in range(am.shape[0]):
        srow = sm.indices[sm.indptr[i]:sm.indptr[i + 1]]
        srow = srow[srow != i]
        if len(srow) == 0:
            continue
        a0, a1 = am.indptr[i], am.indptr[i + 1]
        acols = am.indices[a0:a1]
        strong_mask[a0 + np.searchsorted(acols, srow)] = True
    return strong_mask


def direct_interpolation(a: CSRMatrix, s: CSRMatrix,
                         states: np.ndarray) -> CSRMatrix:
    """interpolation.cpp:443-597. For each F row: P_ij = -(alpha|beta)*a_ij/d
    over strong coarse cols, alpha = (sum all neg off-diag)/(sum strong neg
    coarse), beta likewise for pos (if no strong pos, pos sum folds into the
    diagonal instead)."""
    n = a.n_rows
    col_to_new, n_coarse = _coarse_map(states)
    diag = a.diagonal()

    # The reference re-reads A's values on S's pattern (the golden S files
    # may carry strength values, interpolation.cpp:458-478): mark A's
    # positions that are strong.
    strong_mask = _mark_strong(a, s)

    rows_all, cols_all, data_all = a.row_ids(), a.indices, a.data
    offd = rows_all != cols_all
    neg = data_all < 0

    def _rowsum(mask):
        return np.bincount(rows_all[mask], weights=data_all[mask],
                           minlength=n)

    sum_all_neg = _rowsum(offd & neg)
    sum_all_pos = _rowsum(offd & ~neg)

    s_coarse = strong_mask & offd & (states[cols_all] == S_)
    sum_strong_neg = _rowsum(s_coarse & neg)
    sum_strong_pos = _rowsum(s_coarse & ~neg)

    with np.errstate(divide="ignore", invalid="ignore"):
        alpha = sum_all_neg / sum_strong_neg
    no_pos = sum_strong_pos == 0
    eff_diag = np.where(no_pos, diag + sum_all_pos, diag)
    with np.errstate(divide="ignore", invalid="ignore"):
        beta = np.where(no_pos, 0.0, sum_all_pos / sum_strong_pos)
    neg_coeff = -alpha / eff_diag
    pos_coeff = -beta / eff_diag

    # P entries: C rows get identity; F rows get coeff * a_ij at strong
    # coarse cols (row order preserved = ascending col)
    keep = s_coarse
    p_rows = rows_all[keep]
    p_cols = cols_all[keep]
    p_vals_raw = data_all[keep]
    p_vals = np.where(p_vals_raw < 0, neg_coeff[p_rows] * p_vals_raw,
                      pos_coeff[p_rows] * p_vals_raw)
    f_rows_mask = states[p_rows] == F
    p_rows, p_cols, p_vals = (p_rows[f_rows_mask], p_cols[f_rows_mask],
                              p_vals[f_rows_mask])

    c_rows = np.nonzero(states == S_)[0]
    all_rows = np.concatenate([p_rows, c_rows])
    all_cols = np.concatenate([col_to_new[p_cols], col_to_new[c_rows]])
    all_vals = np.concatenate([p_vals, np.ones(len(c_rows))])

    # no duplicate (row, col) pairs: p entries come from distinct A
    # positions of F rows, c entries are identity rows of C points
    order = np.lexsort((all_cols, all_rows))
    indptr = np.concatenate(
        ([0], np.cumsum(np.bincount(all_rows, minlength=n),
                        dtype=np.int64)))
    return CSRMatrix(n, n_coarse, indptr, all_cols[order], all_vals[order])


def mod_classical_interpolation(a: CSRMatrix, s: CSRMatrix,
                                states: np.ndarray,
                                num_variables: int = 1,
                                variables: np.ndarray = None) -> CSRMatrix:
    """Modified classical interpolation with the PRODUCTION (parallel)
    semantics of par_interpolation.cpp:1012-1400 (what
    ParRugeStubenSolver runs; the serial interpolation.cpp:206-441
    differs: it sign-filters by the TARGET row's diagonal where the
    parallel path uses the strong-F NEIGHBOR's, skips distribution on
    tiny coarse sums where the parallel path distributes the raw tiny
    value, and has no NoNeighbors weak exclusion).

    Row-sequential host loop: for each F row i with weak sum w_i (diag +
    non-strong same-variable non-isolated entries), distribute each
    strong-F neighbor k's value over the strong-C entries it shares
    with row i (entries of sign opposite to a_kk), then scale by
    -1/w_i."""
    n = a.n_rows
    col_to_new, n_coarse = _coarse_map(states)

    from raptor_tpu import native
    if native.available():
        a_indptr, a_indices, a_data = a.sorted_csr()
        s_indptr, s_indices, _ = s.sorted_csr()
        strong_i8 = native.mark_strong(a_indptr, a_indices,
                                       s_indptr, s_indices, n)
        rows, cols, vals = native.mod_classical_interp(
            a_indptr, a_indices, a_data, strong_i8,
            np.ascontiguousarray(states, dtype=np.int64),
            variables, num_variables)
        # entries are emitted row-ordered, unique, in ascending-column
        # order (the kernel walks A's sorted rows) -> direct CSR build
        indptr, cols, vals = native.finalize_interp(
            n, rows, cols, vals, col_to_new, do_sort=False)
        return CSRMatrix(n, n_coarse, indptr, cols, vals)

    am = a.to_scipy()
    sm = s.to_scipy()
    a_indptr, a_indices, a_data = am.indptr, am.indices, am.data
    s_indptr, s_indices = sm.indptr, sm.indices

    # Split A's entries against S's pattern (interpolation.cpp:240-292):
    # SS: strong & Selected; SU: strong & Unselected; NS: weak & Selected.
    # weak_sum[i] = diag + weak same-variable entries.
    strong_mask = _mark_strong(am, sm)

    rows_all = np.repeat(np.arange(n), np.diff(a_indptr))
    is_diag = a_indices == rows_all
    diag = a.diagonal()
    sign = np.where(diag < 0, -1.0, 1.0)

    if num_variables == 1:
        same_var = np.ones(len(a_indices), dtype=bool)
    else:
        same_var = variables[rows_all] == variables[a_indices]

    weak = (~strong_mask & ~is_diag & same_var
            & (states[a_indices] != CFState.NoNeighbors))
    weak_sums = diag.copy()
    np.add.at(weak_sums, rows_all[weak], a_data[weak])

    import scipy.sparse as sp
    sel_ss = strong_mask & (states[a_indices] == S_)
    sel_su = strong_mask & (states[a_indices] == F)
    sel_ns = ~strong_mask & ~is_diag & (states[a_indices] == S_)
    SS = sp.csr_matrix((a_data[sel_ss], (rows_all[sel_ss],
                                         a_indices[sel_ss])), shape=am.shape)
    SU = sp.csr_matrix((a_data[sel_su], (rows_all[sel_su],
                                         a_indices[sel_su])), shape=am.shape)
    NS = sp.csr_matrix((a_data[sel_ns], (rows_all[sel_ns],
                                         a_indices[sel_ns])), shape=am.shape)
    SS.sort_indices(), SU.sort_indices(), NS.sort_indices()

    rows_out, cols_out, vals_out = [], [], []
    row_coarse = np.zeros(n, dtype=bool)
    pos = np.full(n, -1, dtype=np.int64)

    for i in range(n):
        if states[i] == S_:
            rows_out.append(np.array([i]))
            cols_out.append(np.array([col_to_new[i]]))
            vals_out.append(np.array([1.0]))
            continue
        ss_cols = SS.indices[SS.indptr[i]:SS.indptr[i + 1]]
        ss_vals = SS.data[SS.indptr[i]:SS.indptr[i + 1]]
        su_cols = SU.indices[SU.indptr[i]:SU.indptr[i + 1]]
        su_vals = SU.data[SU.indptr[i]:SU.indptr[i + 1]]

        p_vals = ss_vals.astype(np.float64).copy()
        row_coarse[ss_cols] = True
        pos[ss_cols] = np.arange(len(ss_cols))

        weak_sum = weak_sums[i]
        for jj, (col, suv) in enumerate(zip(su_cols, su_vals)):
            # coarse_sum: col's connections (strong or weak-coarse) that
            # are strong-coarse in row i, of sign opposite to a_(col,col)
            sgn = sign[col]
            cs = 0.0
            for mat in (SS, NS):
                kk = slice(mat.indptr[col], mat.indptr[col + 1])
                ck = mat.indices[kk]
                vk = mat.data[kk]
                m = row_coarse[ck] & (vk * sgn < 0)
                cs += vk[m].sum()
            if abs(cs) < ZERO_TOL:
                weak_sum += suv
                ratio = cs    # raw tiny multiplier (:1292)
            else:
                ratio = suv / cs
            if ratio != 0.0:
                for mat in (SS, NS):
                    kk = slice(mat.indptr[col], mat.indptr[col + 1])
                    ck = mat.indices[kk]
                    vk = mat.data[kk]
                    m = row_coarse[ck] & (vk * sgn < 0)
                    np.add.at(p_vals, pos[ck[m]], ratio * vk[m])

        p_vals /= -weak_sum
        rows_out.append(np.full(len(ss_cols), i))
        cols_out.append(col_to_new[ss_cols])
        vals_out.append(p_vals)
        row_coarse[ss_cols] = False
        pos[ss_cols] = -1

    p = sp.csr_matrix(
        (np.concatenate(vals_out),
         (np.concatenate(rows_out), np.concatenate(cols_out))),
        shape=(n, n_coarse))
    p.sum_duplicates()
    p.sort_indices()
    return CSRMatrix.from_scipy(p)


def extended_interpolation(a: CSRMatrix, s: CSRMatrix, states: np.ndarray,
                           num_variables: int = 1,
                           variables: np.ndarray = None) -> CSRMatrix:
    """Extended+i (distance-2) interpolation with the PRODUCTION
    (parallel) semantics of par_interpolation.cpp:301-1010 — the code
    ParRugeStubenSolver actually runs. P's row pattern = strong C
    neighbors of i plus strong C neighbors of i's strong F neighbors;
    each strong F neighbor's value is distributed over that pattern with
    the "+i" term folding A_(col,i) back into the weak sum.

    The parallel path differs from the serial interpolation.cpp:9-205
    in ways that MATTER for convergence on coarse (non-M-matrix)
    operators — found by the live reference oracle
    (tests/test_reference_oracle.py) after our serial-semantics port
    degraded HMIS+Extended to 100 iters at 1024^2 aniso where the
    reference holds 21:
      - a WEAK A entry whose column is in the pattern adds its value
        to that P coefficient (par_interpolation.cpp:727-732); the
        serial code drops it entirely
      - NoNeighbors columns are excluded from the weak sum (:835)
      - the -weak_sum division is guarded by zero_tol (:949)
    """
    import scipy.sparse as sp
    n = a.n_rows
    col_to_new, n_coarse = _coarse_map(states)

    from raptor_tpu import native
    if native.available():
        # lean path: raw sorted CSR arrays, i8 strong flags, and the
        # pattern bound all native -- no scipy wraps, no a.diagonal()
        # (the kernel reads the diagonal itself), no 56M-element gathers
        a_indptr, a_indices, a_data = a.sorted_csr()
        s_indptr, s_indices, _ = s.sorted_csr()
        states64 = np.ascontiguousarray(states, dtype=np.int64)
        strong_i8 = native.mark_strong(a_indptr, a_indices,
                                       s_indptr, s_indices, n)
        bound = native.interp_pattern_bound(a_indptr, a_indices,
                                            strong_i8, states64)
        rows, cols, vals = native.extended_interp(
            a_indptr, a_indices, a_data, strong_i8, states64,
            variables, num_variables, bound)
        # pattern is discovered out of order -> in-row sort in the C pass
        indptr, cols, vals = native.finalize_interp(
            n, rows, cols, vals, col_to_new, do_sort=True)
        return CSRMatrix(n, n_coarse, indptr, cols, vals)

    am = a.to_scipy()
    am.sort_indices()
    a_indptr, a_indices, a_data = am.indptr, am.indices, am.data
    diag = a.diagonal()

    # S off-diagonal pattern (diag handled via `diag`); S carries A's values
    sm = s.to_scipy()
    sm.sort_indices()
    strong_mask = _mark_strong(am, sm)

    scoo = am.tocoo()
    s_off = sp.csr_matrix(
        (a_data[strong_mask], (scoo.row[strong_mask],
                               scoo.col[strong_mask])), shape=am.shape)
    s_off.sort_indices()
    s_indptr, s_indices, s_data = s_off.indptr, s_off.indices, s_off.data
    # diag of S row col = A_(col,col) (interpolation.cpp:134)
    s_diag = diag

    pos = np.full(n, -1, dtype=np.int64)
    p_rows, p_cols, p_vals = [], [], []
    nnz_sofar = 0

    for i in range(n):
        if states[i] == S_:
            p_rows.append(i)
            p_cols.append(i)
            p_vals.append(1.0)
            nnz_sofar += 1
            continue
        row_start = nnz_sofar
        row_cols, row_vals = [], []

        # pattern: strong C of i, plus strong C of strong F neighbors
        # (values all start at 0.0; the A pass below fills them)
        for j in range(s_indptr[i], s_indptr[i + 1]):
            col = s_indices[j]
            if states[col] == S_:
                if pos[col] < row_start:
                    pos[col] = nnz_sofar + len(row_cols)
                    row_cols.append(col)
                    row_vals.append(0.0)
            elif states[col] == F:
                for col_k in s_indices[s_indptr[col]:s_indptr[col + 1]]:
                    if states[col_k] == S_ and pos[col_k] < row_start:
                        pos[col_k] = nnz_sofar + len(row_cols)
                        row_cols.append(col_k)
                        row_vals.append(0.0)
        row_end_len = len(row_cols)
        pos[i] = nnz_sofar + row_end_len   # "+i" sentinel (:716)

        # single A pass (par_interpolation.cpp:719-841): every entry
        # whose column is in the pattern adds to that P slot (strong C
        # or weak alike); strong F entries distribute over the shared
        # coarse pattern; remaining weak entries fold into weak_sum
        weak_sum = diag[i]
        ctr = s_indptr[i]
        endS = s_indptr[i + 1]
        for j in range(a_indptr[i], a_indptr[i + 1]):
            col = a_indices[j]
            if col == i:
                continue
            val = a_data[j]
            idx = pos[col]
            if idx >= row_start and col != i:
                row_vals[idx - row_start] += val
                if ctr < endS and s_indices[ctr] == col:
                    ctr += 1
            elif ctr < endS and s_indices[ctr] == col:
                ctr += 1
                if states[col] != F:
                    continue
                # strong F neighbor: distribute over shared coarse
                # pattern, signs opposite to A_(col,col)
                sgn = 1.0 if s_diag[col] > 0 else -1.0
                coarse_sum = 0.0
                for k in range(a_indptr[col], a_indptr[col + 1]):
                    col_k = a_indices[k]
                    if col_k == col:
                        continue
                    val_k = a_data[k]
                    if val_k * sgn < 0 and pos[col_k] >= row_start:
                        coarse_sum += val_k
                if abs(coarse_sum) < ZERO_TOL:
                    weak_sum += val
                else:
                    cs = val / coarse_sum
                    for k in range(a_indptr[col], a_indptr[col + 1]):
                        col_k = a_indices[k]
                        if col_k == col:
                            continue
                        val_k = a_data[k]
                        if val_k * sgn < 0 and pos[col_k] >= row_start:
                            if col_k == i:
                                weak_sum += cs * val_k
                            else:
                                row_vals[pos[col_k] - row_start] += \
                                    cs * val_k
            else:
                if (num_variables == 1
                        or variables[i] == variables[col]) \
                        and states[col] != CFState.NoNeighbors:
                    weak_sum += val

        pos[i] = -1                         # clear the sentinel
        if abs(weak_sum) > ZERO_TOL:
            for k in range(row_end_len):
                row_vals[k] /= -weak_sum
        p_rows.extend([i] * row_end_len)
        p_cols.extend(row_cols)
        p_vals.extend(row_vals)
        nnz_sofar += row_end_len

    p = sp.csr_matrix(
        (np.asarray(p_vals), (np.asarray(p_rows),
                              col_to_new[np.asarray(p_cols, dtype=np.int64)])),
        shape=(n, n_coarse))
    p.sum_duplicates()
    p.sort_indices()
    return CSRMatrix.from_scipy(p)


def filter_interp(p: CSRMatrix, filter_threshold: float) -> CSRMatrix:
    """Drop P entries below filter_threshold * row max magnitude, preserving
    row sums (par_interpolation.cpp:196-299)."""
    if filter_threshold <= 0:
        return p
    m = p.to_scipy().tocoo()
    n = p.n_rows
    row_max = np.zeros(n)
    np.maximum.at(row_max, m.row, np.abs(m.data))
    keep = np.abs(m.data) >= filter_threshold * row_max[m.row]
    # preserve row sums: scale kept entries by old/new row sum
    old_sum = np.zeros(n)
    np.add.at(old_sum, m.row, m.data)
    new_sum = np.zeros(n)
    np.add.at(new_sum, m.row[keep], m.data[keep])
    with np.errstate(divide="ignore", invalid="ignore"):
        scale = np.where(np.abs(new_sum) > ZERO_TOL, old_sum / new_sum, 1.0)
    import scipy.sparse as sp
    out = sp.csr_matrix((m.data[keep] * scale[m.row[keep]],
                         (m.row[keep], m.col[keep])), shape=m.shape)
    out.sort_indices()
    return CSRMatrix.from_scipy(out)


def _device_interp_inputs(a: CSRMatrix, s: CSRMatrix, states):
    """Shared device-engine preamble: strong flags + coarse map."""
    from raptor_tpu import native
    a_indptr, a_indices, _ = a.sorted_csr()
    s_indptr, s_indices, _ = s.sorted_csr()
    strong = native.mark_strong(a_indptr, a_indices, s_indptr, s_indices,
                                a.n_rows)
    col_to_new, n_coarse = _coarse_map(states)
    return strong, col_to_new, n_coarse


def _device_interp_dtype():
    """f32 on TPU (same policy and rationale as the device RAP engine,
    par_multilevel._galerkin: the TPU has no native f64 — XLA EMULATES
    it, which both runs slowly and explodes the remote compile of the
    big interp programs to tens of minutes); None elsewhere (CPU meshes
    compute f64 and match the host kernel to roundoff)."""
    from raptor_tpu.multilevel.par_multilevel import _tpu_backend_alive
    return np.float32 if _tpu_backend_alive() else None


def _use_device_interp(engine: str, level_nnz: int) -> bool:
    if engine not in ("host", "device", "auto"):
        raise ValueError(f"interp engine {engine!r}")
    if engine == "host":
        return False
    from raptor_tpu import native
    if not native.available():
        return False
    return engine == "device" or _device_interp_profitable(level_nnz)


# which engine the last dispatch actually used ("host" | "device") and
# a running count of device dispatches, recorded so callers (bench.py,
# setup reports) can prove the device path ran rather than silently
# falling back (coarse levels legitimately use host, so the LAST value
# alone would under-report)
LAST_ENGINE = {"interp": "host", "device_calls": 0}


def _extended_dispatch(a: CSRMatrix, s: CSRMatrix, states, num_variables,
                       variables, engine: str, level_nnz: int) -> CSRMatrix:
    """Route extended+i to the host kernel or device/interp.py.  ANY
    device-side failure (width overflow, XLA error, relay death) falls
    back to the host kernel — setup must never abort on an engine
    choice."""
    if num_variables == 1 and _use_device_interp(engine, level_nnz):
        from raptor_tpu.device import interp as dinterp
        strong, col_to_new, n_coarse = _device_interp_inputs(a, s, states)
        try:
            p = dinterp.extended_interp_device(
                a, strong, np.asarray(states), col_to_new, n_coarse,
                dtype=_device_interp_dtype())
            LAST_ENGINE["interp"] = "device"
            LAST_ENGINE["device_calls"] += 1
            return p
        except Exception as e:                       # noqa: BLE001
            _warn_device_fallback("extended", e)
    LAST_ENGINE["interp"] = "host"
    return extended_interpolation(a, s, states, num_variables, variables)


def _mod_classical_dispatch(a: CSRMatrix, s: CSRMatrix, states,
                            num_variables, variables, engine: str,
                            level_nnz: int) -> CSRMatrix:
    """Route mod-classical to the host kernel or device/interp.py (the
    device path handles multi-variable weak sums natively); device
    failures fall back to host like _extended_dispatch."""
    if _use_device_interp(engine, level_nnz):
        from raptor_tpu.device import interp as dinterp
        strong, col_to_new, n_coarse = _device_interp_inputs(a, s, states)
        try:
            p = dinterp.mod_classical_interp_device(
                a, strong, np.asarray(states), col_to_new, n_coarse,
                variables, num_variables,
                dtype=_device_interp_dtype())
            LAST_ENGINE["interp"] = "device"
            LAST_ENGINE["device_calls"] += 1
            return p
        except Exception as e:                       # noqa: BLE001
            _warn_device_fallback("mod_classical", e)
    LAST_ENGINE["interp"] = "host"
    return mod_classical_interpolation(a, s, states, num_variables,
                                       variables)


def _warn_device_fallback(kind: str, err: Exception) -> None:
    import warnings
    warnings.warn(f"device {kind} interpolation failed "
                  f"({type(err).__name__}: {err}); using the host kernel",
                  RuntimeWarning, stacklevel=3)


def _device_interp_profitable(level_nnz: int) -> bool:
    """Same policy as the Galerkin auto-dispatch: a real TPU and a
    level big enough to amortize relay dispatch."""
    import os
    if os.environ.get("RAPTOR_TPU_DEVINTERP", "1") == "0":
        return False
    if level_nnz < int(os.environ.get("RAPTOR_TPU_DEVINTERP_MIN_NNZ",
                                      2_000_000)):
        return False
    from raptor_tpu.multilevel.par_multilevel import _tpu_backend_alive
    return _tpu_backend_alive()


# --- Par wrappers -------------------------------------------------------------

def par_interpolation(a: ParCSRMatrix, s: ParCSRMatrix, states, kind="direct",
                      num_variables=1, variables=None,
                      engine: str = "host") -> ParCSRMatrix:
    """``engine`` selects the extended+i compute path: ``host`` is the
    reference-parity native kernel; ``device`` runs the distance-2 work
    on the default JAX device (device/interp.py); ``auto`` uses the
    device for large single-variable levels on a real TPU (same policy
    as rap_mode).  Device failures/overflows fall back to host."""
    if kind == "direct":
        p = direct_interpolation(a.global_csr, s.global_csr, states)
    elif kind == "mod_classical":
        p = _mod_classical_dispatch(a.global_csr, s.global_csr, states,
                                    num_variables, variables, engine,
                                    a.nnz)
    elif kind == "extended":
        p = _extended_dispatch(a.global_csr, s.global_csr, states,
                               num_variables, variables, engine, a.nnz)
    else:
        raise ValueError(kind)
    part = Partition.create(a.global_num_rows, p.n_cols,
                            a.partition.n_shards)
    # P inherits A's row partition; coarse cols partitioned by ownership of
    # their fine C-points (par_interpolation.cpp builds P's partition the
    # same way)
    row_bounds = a.partition.row_bounds
    sel = (np.asarray(states) == S_)
    csum = np.concatenate([[0], np.cumsum(sel)])
    col_bounds = csum[row_bounds]
    part = Partition(a.global_num_rows, p.n_cols, a.partition.n_shards,
                     row_bounds, col_bounds.astype(np.int64))
    return ParCSRMatrix(p, part)
