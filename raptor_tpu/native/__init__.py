"""Native C++ setup kernels (ctypes bindings).

The reference's setup phase is C++ (cf_splitting.cpp, mis.cpp,
aggregate.cpp); csrc/setup_kernels.cpp provides the same sequential graph
algorithms behind a C ABI, compiled on first use with g++ -O3. The Python
implementations remain the reference oracle and the fallback
(RAPTOR_TPU_NATIVE=0 disables native)."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_lib = None
_lock = threading.Lock()
_SRC = pathlib.Path(__file__).resolve().parents[2] / "csrc" / \
    "setup_kernels.cpp"
_SO = pathlib.Path(__file__).resolve().parent / "_setup_kernels.so"

I64 = ctypes.POINTER(ctypes.c_int64)
F64 = ctypes.POINTER(ctypes.c_double)
I8 = ctypes.POINTER(ctypes.c_int8)
I32 = ctypes.POINTER(ctypes.c_int32)


def _build() -> bool:
    try:
        subprocess.run(
            # -ffp-contract=off: no FMA contraction, so float accumulation
            # is bitwise identical to the NumPy/scipy fallback paths.
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC", str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def available() -> bool:
    return load() is not None


def load():
    global _lib
    if os.environ.get("RAPTOR_TPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.rs_first_pass.argtypes = [ctypes.c_int64] + [I64] * 6
        lib.rs_second_pass.argtypes = [ctypes.c_int64] + [I64] * 3
        lib.cljp_main_loop.argtypes = ([ctypes.c_int64] * 2 + [I64] * 5
                                       + [F64])
        lib.pmis_main_loop.argtypes = [ctypes.c_int64] + [I64] * 5 + [F64]
        lib.mis2.argtypes = [ctypes.c_int64] + [I64] * 4 + [F64, I64]
        lib.aggregate.argtypes = ([ctypes.c_int64] + [I64] * 4
                                  + [F64, I64, F64, I64])
        lib.aggregate.restype = ctypes.c_int64
        lib.mark_strong.argtypes = [ctypes.c_int64] + [I64] * 4 + [I8]
        lib.partition_kway.argtypes = [ctypes.c_int64, I64, I64, F64,
                                       ctypes.c_int64, I64]
        lib.partition_kway.restype = ctypes.c_int64
        interp_args = ([ctypes.c_int64, I64, I64, F64, I8, I64, I64,
                        ctypes.c_int64, I64, I64, F64])
        lib.mod_classical_interp.argtypes = interp_args
        lib.mod_classical_interp.restype = ctypes.c_int64
        lib.extended_interp.argtypes = interp_args
        lib.extended_interp.restype = ctypes.c_int64
        lib.glibc_rand_doubles.argtypes = [ctypes.c_int64, ctypes.c_int64,
                                           F64]
        lib.spgemm_compute.argtypes = ([ctypes.c_int64, ctypes.c_int64,
                                        I64, I64, F64, I64, I64, F64,
                                        ctypes.c_double, I64])
        lib.spgemm_compute.restype = ctypes.c_int64
        lib.spgemm_t_compute.argtypes = ([ctypes.c_int64] * 3
                                         + [I64, I64, F64, I64, I64, F64,
                                            ctypes.c_double, I64])
        lib.spgemm_t_compute.restype = ctypes.c_int64
        lib.spgemm_fetch.argtypes = [I64, F64]
        lib.classical_strength_mask.argtypes = (
            [ctypes.c_int64, I64, I64, F64, ctypes.c_double, I64,
             ctypes.c_int64, I8])
        lib.classical_strength_csr.argtypes = (
            [ctypes.c_int64, I64, I64, F64, ctypes.c_double, I64,
             ctypes.c_int64, I64, I64, F64])
        lib.classical_strength_csr.restype = ctypes.c_int64
        lib.symmetric_strength_mask.argtypes = (
            [ctypes.c_int64, I64, I64, F64, ctypes.c_double, I8])
        lib.symmetric_strength_csr.argtypes = (
            [ctypes.c_int64, I64, I64, F64, ctypes.c_double,
             I64, I64, F64])
        lib.symmetric_strength_csr.restype = ctypes.c_int64
        lib.dist_cljp_update.argtypes = ([ctypes.c_int64] * 3
                                         + [I64] * 13 + [F64, F64])
        lib.dist_mis2_step1.argtypes = ([ctypes.c_int64] + [I64] * 4
                                        + [F64, F64, I64, I64])
        lib.dist_mis2_step2.argtypes = ([ctypes.c_int64] * 2 + [I64] * 6
                                        + [F64, F64, I64, I64,
                                           ctypes.c_int64, I64, F64, I64])
        lib.dist_mis2_steps34.argtypes = ([ctypes.c_int64] * 2
                                          + [I64] * 8
                                          + [ctypes.c_int64, I64, I64])
        lib.dist_aggregate_pass1.argtypes = ([ctypes.c_int64] * 2
                                             + [I64] * 9)
        lib.dist_aggregate_pass2.argtypes = (
            [ctypes.c_int64] + [I64, I64, I64, I64, I64, I64, F64,
                                I64, I64, F64, I64, I64, F64, F64,
                                I64, I64])
        lib.interp_pattern_bound.argtypes = [ctypes.c_int64, I64, I64,
                                             I8, I64]
        lib.interp_pattern_bound.restype = ctypes.c_int64
        lib.interp_dev_widths.argtypes = [ctypes.c_int64, I64, I64, F64,
                                          I8, I64, I64]
        lib.split_pattern.argtypes = ([ctypes.c_int64, ctypes.c_int64]
                                      + [I64] * 6)
        lib.split_pattern.restype = ctypes.c_int64
        lib.interp_dev_widths_mc.argtypes = [ctypes.c_int64, I64, I64,
                                             I8, I64, I64]
        lib.interp_dev_pack_mc.argtypes = (
            [ctypes.c_int64, I64, I64, F64, I8, I64, I64, ctypes.c_int64]
            + [ctypes.c_int64, I32, F64] * 3        # sc, sf, ba
            + [F64, F64])                           # wsum0, sgn
        lib.interp_dev_pack.argtypes = (
            [ctypes.c_int64, I64, I64, F64, I8, I64]
            + [ctypes.c_int64, I32, F64]            # sc
            + [ctypes.c_int64, I32, F64, F64, F64]  # sf + di + at
            + [ctypes.c_int64, I32, F64]            # bcs
            + [ctypes.c_int64, I32, F64]            # bcw
            + [ctypes.c_int64, I32, F64]            # awc
            + [F64, F64])                           # dsc, wsum0
        lib.stencil_csr.argtypes = ([ctypes.c_int64, I64, ctypes.c_int64,
                                     I64, F64, I64, I64, I64, F64])
        lib.stencil_csr.restype = ctypes.c_int64
        lib.finalize_interp.argtypes = ([ctypes.c_int64, ctypes.c_int64,
                                         I64, I64, F64, I64,
                                         ctypes.c_int64, I64])
        lib.greedy_coloring.argtypes = [ctypes.c_int64, I64, I64, I64]
        lib.greedy_coloring.restype = ctypes.c_int64
        lib.level_schedule.argtypes = [ctypes.c_int64, I64, I64,
                                       ctypes.c_int64, I64]
        _lib = lib
        return _lib


def _p(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def _c(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def rs_first_pass(indptr, indices, col_ptr, col_indices, weights, states):
    lib = load()
    n = len(weights)
    indptr, indices = _c(indptr), _c(indices)
    col_ptr, col_indices = _c(col_ptr), _c(col_indices)
    lib.rs_first_pass(n, _p(indptr, I64), _p(indices, I64),
                      _p(col_ptr, I64), _p(col_indices, I64),
                      _p(weights, I64), _p(states, I64))


def rs_second_pass(indptr, indices, states):
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    lib.rs_second_pass(len(indptr) - 1, _p(indptr, I64), _p(indices, I64),
                       _p(states, I64))


def cljp_main_loop(indptr, indices, col_ptr, col_indices, states, weights):
    lib = load()
    n = len(states)
    indptr, indices = _c(indptr), _c(indices)
    col_ptr, col_indices = _c(col_ptr), _c(col_indices)
    lib.cljp_main_loop(n, len(indices), _p(indptr, I64), _p(indices, I64),
                       _p(col_ptr, I64), _p(col_indices, I64),
                       _p(states, I64), _p(weights, F64))


def pmis_main_loop(indptr, indices, col_ptr, col_indices, states, weights):
    lib = load()
    n = len(states)
    indptr, indices = _c(indptr), _c(indices)
    col_ptr, col_indices = _c(col_ptr), _c(col_indices)
    lib.pmis_main_loop(n, _p(indptr, I64), _p(indices, I64),
                       _p(col_ptr, I64), _p(col_indices, I64),
                       _p(states, I64), _p(weights, F64))


def mis2(indptr, indices, cindptr, cindices, r, states):
    lib = load()
    n = len(states)
    indptr, indices = _c(indptr), _c(indices)
    cindptr, cindices = _c(cindptr), _c(cindices)
    lib.mis2(n, _p(indptr, I64), _p(indices, I64), _p(cindptr, I64),
             _p(cindices, I64), _p(r, F64), _p(states, I64))


def aggregate(s_indptr, s_indices, a_indptr, a_indices, a_data, states, r,
              aggregates):
    lib = load()
    n = len(states)
    s_indptr, s_indices = _c(s_indptr), _c(s_indices)
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    return lib.aggregate(n, _p(s_indptr, I64), _p(s_indices, I64),
                         _p(a_indptr, I64), _p(a_indices, I64),
                         _p(a_data, F64), _p(states, I64), _p(r, F64),
                         _p(aggregates, I64))


def partition_kway(indptr, indices, ew, n, k):
    """Multilevel k-way partition of a symmetric no-self-loop adjacency
    CSR (csrc partition_kway; the ParMETIS_V3_PartKway analog). Returns
    (part[n], edge_cut)."""
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    part = np.zeros(n, dtype=np.int64)
    if ew is not None:
        ew = np.ascontiguousarray(ew, dtype=np.float64)
        ew_p = _p(ew, F64)
    else:
        ew_p = F64()
    cut = lib.partition_kway(n, _p(indptr, I64), _p(indices, I64),
                             ew_p, k, _p(part, I64))
    return part, cut / 1048576.0


def mark_strong(a_indptr, a_indices, s_indptr, s_indices, n):
    lib = load()
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    s_indptr, s_indices = _c(s_indptr), _c(s_indices)
    strong = np.zeros(len(a_indices), dtype=np.int8)
    lib.mark_strong(n, _p(a_indptr, I64), _p(a_indices, I64),
                    _p(s_indptr, I64), _p(s_indices, I64), _p(strong, I8))
    return strong


# Persistent triplet buffers for the interpolation kernels (grow-only,
# like the C++ spgemm buffers): the dist-2 pattern bound is hundreds of MB
# at scale, and a fresh calloc per level would pay the ~30 us/page
# first-touch fault tax on every setup. Returned views are valid only
# until the next _interp call -- callers copy out (finalize_interp) or
# consume immediately (the distributed per-shard path).
_TRIP = {"rows": None, "cols": None, "vals": None}


def _trip_buffers(bound):
    r = _TRIP["rows"]
    if r is None or len(r) < bound:
        _TRIP["rows"] = np.empty(bound, dtype=np.int64)
        _TRIP["cols"] = np.empty(bound, dtype=np.int64)
        _TRIP["vals"] = np.empty(bound, dtype=np.float64)
    return _TRIP["rows"], _TRIP["cols"], _TRIP["vals"]


def _interp(fn, a_indptr, a_indices, a_data, strong, states, variables,
            num_variables, bound):
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    a_data = np.ascontiguousarray(a_data, dtype=np.float64)
    strong = np.ascontiguousarray(strong, dtype=np.int8)
    states = _c(states)
    n = len(a_indptr) - 1
    if variables is None:
        variables = np.zeros(1, dtype=np.int64)
        num_variables = 1
    else:
        variables = _c(variables)
    rows, cols, vals = _trip_buffers(bound)
    nnz = fn(n, _p(a_indptr, I64), _p(a_indices, I64), _p(a_data, F64),
             _p(strong, I8), _p(states, I64), _p(variables, I64),
             num_variables, _p(rows, I64), _p(cols, I64), _p(vals, F64))
    return rows[:nnz], cols[:nnz], vals[:nnz]


def mod_classical_interp(a_indptr, a_indices, a_data, strong, states,
                         variables, num_variables):
    lib = load()
    bound = len(a_indices) + len(a_indptr)
    return _interp(lib.mod_classical_interp, a_indptr, a_indices, a_data,
                   strong, states, variables, num_variables, bound)


def extended_interp(a_indptr, a_indices, a_data, strong, states,
                    variables, num_variables, bound):
    lib = load()
    return _interp(lib.extended_interp, a_indptr, a_indices, a_data,
                   strong, states, variables, num_variables, bound)


def interp_dev_prep(a_indptr, a_indices, a_data, strong, states):
    """All host-side operands of the device extended+i pipeline in one
    C pass over the FULL sorted CSR (device/interp.py::_prep contract):
    returns (sc, sf, di_v, at_v, bcs, bcw, awc, dsc, wsum0, p_bound)
    where each ELL pair is ([W, n] int32 cols, [W, n] f64 vals)."""
    lib = load()
    n = len(a_indptr) - 1
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    a_data = np.ascontiguousarray(a_data, dtype=np.float64)
    strong = np.ascontiguousarray(strong, dtype=np.int8)
    states = _c(states)
    widths = np.zeros(6, dtype=np.int64)
    lib.interp_dev_widths(n, _p(a_indptr, I64), _p(a_indices, I64),
                          _p(a_data, F64), _p(strong, I8),
                          _p(states, I64), _p(widths, I64))
    w_sc, w_sf, w_bcs, w_bcw, w_awc, p_bound = (int(x) for x in widths)

    def ell(w):
        return (np.empty((w, n), dtype=np.int32),
                np.empty((w, n), dtype=np.float64))

    sc_c, sc_v = ell(w_sc)
    sf_c, sf_v = ell(w_sf)
    di_v = np.empty((w_sf, n))
    at_v = np.empty((w_sf, n))
    bcs_c, bcs_v = ell(w_bcs)
    bcw_c, bcw_v = ell(w_bcw)
    awc_c, awc_v = ell(w_awc)
    dsc = np.empty(n)
    wsum0 = np.empty(n)
    lib.interp_dev_pack(
        n, _p(a_indptr, I64), _p(a_indices, I64), _p(a_data, F64),
        _p(strong, I8), _p(states, I64),
        w_sc, _p(sc_c, I32), _p(sc_v, F64),
        w_sf, _p(sf_c, I32), _p(sf_v, F64), _p(di_v, F64), _p(at_v, F64),
        w_bcs, _p(bcs_c, I32), _p(bcs_v, F64),
        w_bcw, _p(bcw_c, I32), _p(bcw_v, F64),
        w_awc, _p(awc_c, I32), _p(awc_v, F64),
        _p(dsc, F64), _p(wsum0, F64))
    return dict(sc=(sc_c, sc_v), sf=(sf_c, sf_v), di_v=di_v, at_v=at_v,
                bcs=(bcs_c, bcs_v), bcw=(bcw_c, bcw_v),
                awc=(awc_c, awc_v), dsc=dsc, wsum0=wsum0, p_bound=p_bound)


def split_pattern(indptr, indices, n_rows, n_cols=None):
    """Diag-stripped CSR pattern + CSC transpose in one C pass:
    (indptr, indices, col_ptr, col_indices). Rectangular inputs are
    legal (col_ptr is sized by n_cols)."""
    lib = load()
    if n_cols is None:
        n_cols = n_rows
    indptr, indices = _c(indptr), _c(indices)
    nnz = len(indices)
    out_indptr = np.empty(n_rows + 1, dtype=np.int64)
    out_indices = np.empty(nnz, dtype=np.int64)
    col_ptr = np.empty(n_cols + 1, dtype=np.int64)
    col_indices = np.empty(nnz, dtype=np.int64)
    m = lib.split_pattern(n_rows, n_cols, _p(indptr, I64),
                          _p(indices, I64),
                          _p(out_indptr, I64), _p(out_indices, I64),
                          _p(col_ptr, I64), _p(col_indices, I64))
    return out_indptr, out_indices[:m], col_ptr, col_indices[:m]


def interp_dev_prep_mc(a_indptr, a_indices, a_data, strong, states,
                       variables=None, num_variables: int = 1):
    """Mod-classical variant of interp_dev_prep: (sc, sf, ba, wsum0,
    sgn) where ba holds ALL C-state off-diagonal entries (sign applied
    per target row on device) and wsum0 honors same-variable weak sums."""
    lib = load()
    n = len(a_indptr) - 1
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    a_data = np.ascontiguousarray(a_data, dtype=np.float64)
    strong = np.ascontiguousarray(strong, dtype=np.int8)
    states = _c(states)
    if variables is None:
        variables = np.zeros(n, dtype=np.int64)
        num_variables = 1
    variables = _c(variables)
    widths = np.zeros(3, dtype=np.int64)
    lib.interp_dev_widths_mc(n, _p(a_indptr, I64), _p(a_indices, I64),
                             _p(strong, I8), _p(states, I64),
                             _p(widths, I64))
    w_sc, w_sf, w_ba = (int(x) for x in widths)

    def ell(w):
        return (np.empty((w, n), dtype=np.int32),
                np.empty((w, n), dtype=np.float64))

    sc_c, sc_v = ell(w_sc)
    sf_c, sf_v = ell(w_sf)
    ba_c, ba_v = ell(w_ba)
    wsum0 = np.empty(n)
    sgn = np.empty(n)
    lib.interp_dev_pack_mc(
        n, _p(a_indptr, I64), _p(a_indices, I64), _p(a_data, F64),
        _p(strong, I8), _p(states, I64), _p(variables, I64),
        num_variables,
        w_sc, _p(sc_c, I32), _p(sc_v, F64),
        w_sf, _p(sf_c, I32), _p(sf_v, F64),
        w_ba, _p(ba_c, I32), _p(ba_v, F64),
        _p(wsum0, F64), _p(sgn, F64))
    return dict(sc=(sc_c, sc_v), sf=(sf_c, sf_v), ba=(ba_c, ba_v),
                wsum0=wsum0, sgn=sgn)


def interp_pattern_bound(a_indptr, a_indices, strong, states) -> int:
    """Entry-count bound of the extended+i distance-2 pattern (one C pass
    over A's entries; ``strong`` i8, ``states`` CF states)."""
    lib = load()
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    strong = np.ascontiguousarray(strong, dtype=np.int8)
    states = _c(states)
    return int(lib.interp_pattern_bound(
        len(a_indptr) - 1, _p(a_indptr, I64), _p(a_indices, I64),
        _p(strong, I8), _p(states, I64)))


def stencil_csr(grid, dcols, dvals, offs):
    """Direct CSR assembly of a constant-stencil grid operator; ``dcols``
    ascending column offsets, ``offs`` [K, dim] per-dimension steps."""
    lib = load()
    grid = _c(grid)
    dim = len(grid)
    n_v = int(np.prod(grid))
    K = len(dcols)
    dcols, offs = _c(dcols), _c(offs)
    dvals = np.ascontiguousarray(dvals, dtype=np.float64)
    indptr = np.empty(n_v + 1, dtype=np.int64)
    indices = np.empty(n_v * K, dtype=np.int64)
    data = np.empty(n_v * K, dtype=np.float64)
    nnz = lib.stencil_csr(dim, _p(grid, I64), K, _p(dcols, I64),
                          _p(dvals, F64), _p(offs, I64), _p(indptr, I64),
                          _p(indices, I64), _p(data, F64))
    return indptr, indices[:nnz], data[:nnz]


def finalize_interp(n, rows, cols, vals, col_map, do_sort):
    """Triplets (row-ordered, unique cols per row) -> CSR arrays with
    columns mapped through ``col_map`` and per-row sorted when asked.
    Copies the result out of the persistent _interp buffers."""
    lib = load()
    rows, cols, col_map = _c(rows), _c(cols), _c(col_map)
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    indptr = np.empty(n + 1, dtype=np.int64)
    lib.finalize_interp(n, len(rows), _p(rows, I64), _p(cols, I64),
                        _p(vals, F64), _p(col_map, I64), int(do_sort),
                        _p(indptr, I64))
    return indptr, cols.copy(), vals.copy()


def greedy_coloring(indptr, indices) -> np.ndarray:
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    n = len(indptr) - 1
    colors = np.full(n, -1, dtype=np.int64)
    lib.greedy_coloring(n, _p(indptr, I64), _p(indices, I64),
                        _p(colors, I64))
    return colors


def level_schedule(indptr, indices, reverse: bool) -> np.ndarray:
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    n = len(indptr) - 1
    level = np.zeros(n, dtype=np.int64)
    lib.level_schedule(n, _p(indptr, I64), _p(indices, I64),
                       int(reverse), _p(level, I64))
    return level


def glibc_rand_doubles(seed: int, n: int) -> np.ndarray:
    lib = load()
    out = np.empty(n, dtype=np.float64)
    lib.glibc_rand_doubles(seed, n, _p(out, F64))
    return out


def classical_strength_mask(indptr, indices, data, theta,
                            variables=None, num_variables=1):
    """0/1 keep mask over CSR entries (classical strength, one pass)."""
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = len(indptr) - 1
    keep = np.empty(len(indices), dtype=np.int8)
    if variables is None:
        variables = np.zeros(1, dtype=np.int64)
        num_variables = 1
    else:
        variables = _c(variables)
    lib.classical_strength_mask(n, _p(indptr, I64), _p(indices, I64),
                                _p(data, F64), float(theta),
                                _p(variables, I64), int(num_variables),
                                _p(keep, I8))
    return keep


def classical_strength_csr(indptr, indices, data, theta,
                           variables=None, num_variables=1):
    """S as a CSR directly (threshold + compress fused in one C pass;
    same keep rule as classical_strength_mask, the oracle)."""
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = len(indptr) - 1
    if variables is None:
        variables = np.zeros(1, dtype=np.int64)
        num_variables = 1
    else:
        variables = _c(variables)
    out_indptr = np.empty(n + 1, dtype=np.int64)
    out_indices = np.empty(len(indices), dtype=np.int64)
    out_data = np.empty(len(indices))
    m = lib.classical_strength_csr(
        n, _p(indptr, I64), _p(indices, I64), _p(data, F64),
        float(theta), _p(variables, I64), int(num_variables),
        _p(out_indptr, I64), _p(out_indices, I64), _p(out_data, F64))
    return out_indptr, out_indices[:m], out_data[:m]


def symmetric_strength_csr(indptr, indices, data, theta):
    """Symmetric-strength S as a CSR directly (fused threshold +
    compress; symmetric_strength_mask is the oracle)."""
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = len(indptr) - 1
    out_indptr = np.empty(n + 1, dtype=np.int64)
    out_indices = np.empty(len(indices), dtype=np.int64)
    out_data = np.empty(len(indices))
    m = lib.symmetric_strength_csr(
        n, _p(indptr, I64), _p(indices, I64), _p(data, F64), float(theta),
        _p(out_indptr, I64), _p(out_indices, I64), _p(out_data, F64))
    return out_indptr, out_indices[:m], out_data[:m]


def symmetric_strength_mask(indptr, indices, data, theta):
    lib = load()
    indptr, indices = _c(indptr), _c(indices)
    data = np.ascontiguousarray(data, dtype=np.float64)
    n = len(indptr) - 1
    keep = np.empty(len(indices), dtype=np.int8)
    lib.symmetric_strength_mask(n, _p(indptr, I64), _p(indices, I64),
                                _p(data, F64), float(theta),
                                _p(keep, I8))
    return keep


def dist_cljp_update(n, h, first_local_col, on_indptr, on_indices,
                     off_indptr, off_indices, hp_indptr, hp_cols, cmap,
                     st, hstU, sel, hnew, edgemark_on, edgemark_off,
                     w, off_dec):
    """One round of distributed-CLJP weight updates (in place on
    edgemark_on/off, w, off_dec)."""
    lib = load()
    args = [_c(x) for x in (on_indptr, on_indices, off_indptr,
                            off_indices, hp_indptr, hp_cols, cmap, st,
                            hstU, sel, hnew)]
    em_on, em_off = _c(edgemark_on), _c(edgemark_off)
    lib.dist_cljp_update(
        n, h, first_local_col, *[_p(a, I64) for a in args],
        _p(em_on, I64), _p(em_off, I64), _p(w, F64), _p(off_dec, F64))
    return em_on, em_off


def dist_mis2_step1(on_indptr, on_indices, off_indptr, off_indices,
                    rr, halo_r, hst, st):
    lib = load()
    a = [_c(x) for x in (on_indptr, on_indices, off_indptr, off_indices)]
    hst = _c(hst)
    lib.dist_mis2_step1(len(st), *[_p(x, I64) for x in a],
                        _p(rr, F64), _p(halo_r, F64), _p(hst, I64),
                        _p(st, I64))


def dist_mis2_step2(h, on_indptr, on_indices, off_indptr, off_indices,
                    hp_indptr, hp_cols, rr, halo_r, hst, fr, fst, frr,
                    st):
    lib = load()
    a = [_c(x) for x in (on_indptr, on_indices, off_indptr, off_indices,
                         hp_indptr, hp_cols)]
    hst, fr, fst = _c(hst), _c(fr), _c(fst)
    lib.dist_mis2_step2(len(st), h, *[_p(x, I64) for x in a],
                        _p(rr, F64), _p(halo_r, F64), _p(hst, I64),
                        _p(fr, I64), len(fr), _p(fst, I64),
                        _p(frr, F64), _p(st, I64))


def dist_mis2_steps34(h, on_indptr, on_indices, off_indptr, off_indices,
                      hp_indptr, hp_cols, hst, fr, fst, st):
    lib = load()
    a = [_c(x) for x in (on_indptr, on_indices, off_indptr, off_indices,
                         hp_indptr, hp_cols)]
    hst, fr, fst = _c(hst), _c(fr), _c(fst)
    lib.dist_mis2_steps34(len(st), h, *[_p(x, I64) for x in a],
                          _p(hst, I64), _p(fr, I64), len(fr),
                          _p(fst, I64), _p(st, I64))


def dist_aggregate_pass1(first_local_col, s_on_indptr, s_on_indices,
                         s_off_indptr, s_off_indices, cmap, st, hst,
                         hagg, agg):
    lib = load()
    a = [_c(x) for x in (s_on_indptr, s_on_indices, s_off_indptr,
                         s_off_indices, cmap, st, hst, hagg)]
    lib.dist_aggregate_pass1(len(st), first_local_col,
                             *[_p(x, I64) for x in a], _p(agg, I64))


def dist_aggregate_pass2(s_on_indptr, s_on_indices, s_off_indptr,
                         s_off_indices, a_on_indptr, a_on_indices,
                         a_on_data, a_off_indptr, a_off_indices,
                         a_off_data, amap, smap, r_loc, halo_r, hagg,
                         agg):
    lib = load()
    ii = [_c(x) for x in (s_on_indptr, s_on_indices, s_off_indptr,
                          s_off_indices)]
    ai = [_c(x) for x in (a_on_indptr, a_on_indices)]
    oi = [_c(x) for x in (a_off_indptr, a_off_indices)]
    amap, smap, hagg = _c(amap), _c(smap), _c(hagg)
    a_on_data = np.ascontiguousarray(a_on_data, dtype=np.float64)
    a_off_data = np.ascontiguousarray(a_off_data, dtype=np.float64)
    lib.dist_aggregate_pass2(
        len(agg), *[_p(x, I64) for x in ii], *[_p(x, I64) for x in ai],
        _p(a_on_data, F64), *[_p(x, I64) for x in oi],
        _p(a_off_data, F64), _p(amap, I64), _p(smap, I64),
        _p(r_loc, F64), _p(halo_r, F64), _p(hagg, I64), _p(agg, I64))


def spgemm(n_rows, n_cols_b, a_indptr, a_indices, a_data,
           b_indptr, b_indices, b_data, zero_tol):
    """C = A @ B (CSR), sorted cols, |c| <= zero_tol dropped.
    Returns (indptr, indices, data)."""
    lib = load()
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    b_indptr, b_indices = _c(b_indptr), _c(b_indices)
    a_data = np.ascontiguousarray(a_data, dtype=np.float64)
    b_data = np.ascontiguousarray(b_data, dtype=np.float64)
    c_indptr = np.zeros(n_rows + 1, dtype=np.int64)
    nnz = lib.spgemm_compute(
        n_rows, n_cols_b, _p(a_indptr, I64), _p(a_indices, I64),
        _p(a_data, F64), _p(b_indptr, I64), _p(b_indices, I64),
        _p(b_data, F64), zero_tol, _p(c_indptr, I64))
    c_indices = np.empty(nnz, dtype=np.int64)
    c_data = np.empty(nnz, dtype=np.float64)
    lib.spgemm_fetch(_p(c_indices, I64), _p(c_data, F64))
    return c_indptr, c_indices, c_data


def spgemm_T(n_rows_a, n_cols_a, n_cols_b, a_indptr, a_indices, a_data,
             b_indptr, b_indices, b_data, zero_tol):
    """C = A^T @ B (CSR inputs, no explicit transpose), sorted cols,
    |c| <= zero_tol dropped. Bitwise equal to
    spgemm(CSR(A^T), B). Returns (indptr, indices, data)."""
    lib = load()
    a_indptr, a_indices = _c(a_indptr), _c(a_indices)
    b_indptr, b_indices = _c(b_indptr), _c(b_indices)
    a_data = np.ascontiguousarray(a_data, dtype=np.float64)
    b_data = np.ascontiguousarray(b_data, dtype=np.float64)
    c_indptr = np.zeros(n_cols_a + 1, dtype=np.int64)
    nnz = lib.spgemm_t_compute(
        n_rows_a, n_cols_a, n_cols_b, _p(a_indptr, I64),
        _p(a_indices, I64), _p(a_data, F64), _p(b_indptr, I64),
        _p(b_indices, I64), _p(b_data, F64), zero_tol,
        _p(c_indptr, I64))
    c_indices = np.empty(nnz, dtype=np.int64)
    c_data = np.empty(nnz, dtype=np.float64)
    lib.spgemm_fetch(_p(c_indices, I64), _p(c_data, F64))
    return c_indptr, c_indices, c_data
