"""Device-side sparse matrix-matrix products (the Galerkin RAP on chip).

The reference computes AP = A*P and Ac = P^T*(AP) with a single-threaded
Gustavson SpGEMM on the host (util/linalg/par_matmult.cpp:79-441,
matmult.cpp:90-226).  On this machine the host has ONE core and the
native C++ kernel already runs at its measured single-core roofline
(~40 M products/s), so the only way to the chip's throughput is to move
the product onto the TPU.

TPU-native formulation (no Gustavson, no hash tables — those need
data-dependent control flow XLA can't trace):

  1. EXPAND   every output row's candidate entries into a dense padded
              slab of shape [Wc, C] (candidate slot major, row on the
              lane axis; C = a static row chunk).  For ELL operands the
              candidates are cols[wb, Acols[wa, i]] — a gather; for a
              DIA (stencil) left operand the gather collapses to a
              pad+slice SHIFT of the B arrays: zero gathers on the fine
              level, where all the nnz are.
  2. SORT     along axis 0 (jax.lax.sort: C independent Wc-length sorts
              vectorized across lanes — the axis-0 sort is the
              TPU-friendly one; minor-axis sorts need lane shuffles).
  3. MERGE    duplicate columns with a segmented prefix sum
              (associative_scan of the linear recurrence
              s_j = v_j + [c_j == c_{j-1}] * s_{j-1}), keeping the last
              element of each run.
  4. COMPACT  survivors to the front with a second axis-0 sort on
              (kept ? col : SENTINEL) and slice to a static width cap.

Row chunks all have identical shapes (operands are host-prepadded), so
the whole product is ONE compiled program replayed per chunk.  The host
reads back [Wcap, C] cols/vals plus per-row counts and assembles the
CSR.  If a row overflows the static cap, the product is re-run once
with the exact measured width; only a pathological failure falls back
to the native host kernel (correctness is never at risk — the cap only
gates which engine computes).

Precision: the host/reference path is f64 and stays the default for
golden parity; device RAP on TPU computes in f32 (the TPU has no native
f64).  A coarse-operator perturbation of ~1e-7 relative is harmless to
a preconditioner — the outer Krylov/mixed-precision iteration measures
its residual against the exact fine operator.  On CPU meshes the same
code runs in f64 and matches the host kernel to roundoff, which is how
the tests pin it down.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.types import ZERO_TOL

SENT = np.int32(2**31 - 1)  # sentinel column id: sorts after any real col

# Candidate-slab byte budget per chunk (cols + vals buffers each).
_SLAB_BYTES = 256 * 1024 * 1024


# --- packing (host) ----------------------------------------------------------

def csr_to_ell(a: CSRMatrix, dtype=np.float64, n_pad: Optional[int] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Pack CSR into [W, n] ELL (slot major, row minor).  Padding slots
    carry col=SENT / val=0 so they sort to the end and merge to nothing."""
    n = a.n_rows if n_pad is None else n_pad
    row_nnz = np.diff(a.indptr)
    W = max(1, int(row_nnz.max()) if a.nnz else 1)
    cols = np.full((W, n), SENT, dtype=np.int32)
    vals = np.zeros((W, n), dtype=dtype)
    if a.nnz:
        rows = np.repeat(np.arange(a.n_rows), row_nnz)
        pos = np.arange(a.nnz) - np.repeat(a.indptr[:-1], row_nnz)
        cols[pos, rows] = a.indices
        vals[pos, rows] = a.data
    return cols, vals


def csr_to_dia(a: CSRMatrix, max_diags: int = 48
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Extract [K] offsets + [K, n] per-diagonal values if the matrix is
    a stencil (few distinct col-row offsets); None otherwise."""
    if a.nnz == 0:
        return None
    rows = np.repeat(np.arange(a.n_rows), np.diff(a.indptr))
    d = a.indices.astype(np.int64) - rows
    offsets = np.unique(d)
    if len(offsets) > max_diags:
        return None
    k = np.searchsorted(offsets, d)
    vals = np.zeros((len(offsets), a.n_rows), dtype=a.data.dtype)
    vals[k, rows] = a.data
    return offsets, vals


# --- the device kernel (pure jax; jitted via the cached wrappers below) ------

_MERGE_GROUP = 1024


def _merge_compact(cand_c: jnp.ndarray, cand_v: jnp.ndarray,
                   w_cap: int, zero_tol: float):
    """Steps 2-4: sort / merge-duplicates / compact a [Wc, C] candidate
    slab.  Returns ([w_cap, C] cols, [w_cap, C] vals, [C] counts,
    scalar max_count).

    Slabs taller than _MERGE_GROUP are merged as a TREE: each group of
    rows is sorted/merged to w_cap (zero_tol deferred so partial sums
    keep cancelling/accumulating), then the group results merge once
    more.  A single lax.sort over a many-thousand-row slab (the P^T*AP
    product reaches W_a*W_b ~ 7k candidates at 128^3) OOM-KILLED the
    relay's remote compile helper; the tree keeps every sort at most
    _MERGE_GROUP + n_groups*w_cap tall — and bitonic cost is
    H log^2 H, so the tree is also cheaper at runtime.  A group
    truncated at w_cap surfaces through max_count, which triggers the
    caller's exact-width retry exactly like the flat path."""
    H = cand_c.shape[0]
    # group >= 2*w_cap so the re-merge height n_g*w_cap <= H/2 strictly
    # shrinks (else the recursion would grow when w_cap >= the group)
    G = max(_MERGE_GROUP, 2 * w_cap)
    if H > G:
        n_g = -(-H // G)
        pad = n_g * G - H
        if pad:
            cand_c = jnp.concatenate(
                [cand_c, jnp.full((pad,) + cand_c.shape[1:], SENT,
                                  cand_c.dtype)], axis=0)
            cand_v = jnp.concatenate(
                [cand_v, jnp.zeros((pad,) + cand_v.shape[1:],
                                   cand_v.dtype)], axis=0)
        ks, vs, mxs = [], [], []
        for g in range(n_g):
            sl = slice(g * G, (g + 1) * G)
            k, s, _, m = _merge_compact(cand_c[sl], cand_v[sl],
                                        w_cap, 0.0)
            ks.append(k)
            vs.append(s)
            mxs.append(m)
        key, sval, counts, m2 = _merge_compact(
            jnp.concatenate(ks, axis=0), jnp.concatenate(vs, axis=0),
            w_cap, zero_tol)
        return key, sval, counts, jnp.maximum(
            m2, jnp.stack(mxs).max())
    c, v = jax.lax.sort((cand_c, cand_v), dimension=0, num_keys=1)
    # segmented sum: s_j = v_j + (c_j == c_{j-1}) * s_{j-1}
    same = jnp.concatenate(
        [jnp.zeros((1,) + c.shape[1:], bool), c[1:] == c[:-1]], axis=0)
    a_co = same.astype(v.dtype)

    def comb(x, y):
        return (x[0] * y[0], y[1] + y[0] * x[1])

    _, s = jax.lax.associative_scan(comb, (a_co, v), axis=0)
    # last of each run; drop sentinels and |sum| <= zero_tol
    last = jnp.concatenate(
        [c[:-1] != c[1:], jnp.ones((1,) + c.shape[1:], bool)], axis=0)
    keep = last & (c != SENT) & (jnp.abs(s) > zero_tol)
    key = jnp.where(keep, c, SENT)
    sval = jnp.where(keep, s, jnp.zeros((), v.dtype))
    key, sval = jax.lax.sort((key, sval), dimension=0, num_keys=1)
    counts = keep.sum(axis=0, dtype=jnp.int32)
    return key[:w_cap], sval[:w_cap], counts, counts.max()


def ell_spgemm(a_cols, a_vals, b_cols, b_vals, w_cap: int,
               zero_tol: float = ZERO_TOL):
    """C = A B, both operands in [W, n] ELL.  The B-row gather is a
    jnp.take along the row axis (slice size W_b per index)."""
    _, n = a_cols.shape
    safe = jnp.where(a_cols == SENT, 0, a_cols)
    bc = jnp.take(b_cols, safe, axis=1)          # [Wb, Wa, n]
    bv = jnp.take(b_vals, safe, axis=1)
    valid = (a_cols != SENT) & (bc != SENT)
    cand_c = jnp.where(valid, bc, SENT).reshape(-1, n)
    cand_v = jnp.where(valid, a_vals[None] * bv,
                       jnp.zeros((), a_vals.dtype)).reshape(-1, n)
    return _merge_compact(cand_c, cand_v, w_cap, zero_tol)


def dia_ell_spgemm(rel_offsets: tuple, dia_vals, b_cols_w, b_vals_w,
                   w_cap: int, zero_tol: float = ZERO_TOL):
    """C = A B with stencil A ([K, C] diagonal values for one row chunk)
    against a pre-padded B WINDOW ([Wb, C + span]): the candidate slab
    is built from static slices of the window — pure shifts, no gathers.
    This is the fine-level path (level 0 holds most of the RAP nnz).
    rel_offsets[k] = offset_k - min(offsets) >= 0 indexes the window."""
    K, C = dia_vals.shape
    cc, cv = [], []
    for k, r in enumerate(rel_offsets):
        bc = jax.lax.dynamic_slice_in_dim(b_cols_w, r, C, axis=1)
        bv = jax.lax.dynamic_slice_in_dim(b_vals_w, r, C, axis=1)
        valid = bc != SENT
        cc.append(jnp.where(valid, bc, SENT))
        cv.append(jnp.where(valid, dia_vals[k][None] * bv,
                            jnp.zeros((), dia_vals.dtype)))
    cand_c = jnp.concatenate(cc, axis=0)
    cand_v = jnp.concatenate(cv, axis=0)
    return _merge_compact(cand_c, cand_v, w_cap, zero_tol)


_jit_ell = jax.jit(ell_spgemm, static_argnames=("w_cap", "zero_tol"))
_jit_dia = jax.jit(dia_ell_spgemm,
                   static_argnames=("rel_offsets", "w_cap", "zero_tol"))


# --- host wrappers -----------------------------------------------------------

class CapOverflow(Exception):
    """A row of the product exceeded the static width cap even after the
    exact-width retry; caller must fall back to the host kernel."""


def _assemble_csr(n_rows: int, n_cols: int, cols_np: np.ndarray,
                  vals_np: np.ndarray, counts: np.ndarray,
                  out_dtype=np.float64) -> CSRMatrix:
    """[Wcap, >=n_rows] device output -> canonical CSR."""
    cols = cols_np[:, :n_rows].T           # [n, Wcap]
    vals = vals_np[:, :n_rows].T
    counts = counts[:n_rows]
    mask = np.arange(cols.shape[1])[None, :] < counts[:, None]
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return CSRMatrix(n_rows, n_cols, indptr,
                     cols[mask].astype(np.int64),
                     vals[mask].astype(out_dtype))


def _chunk_rows(n: int, w_cand: int, itemsize: int) -> int:
    """Row-chunk size: candidate slab (cols+vals) stays under budget,
    chunk a multiple of 512 lanes."""
    per_row = w_cand * max(itemsize, 4)
    c = max(512, _SLAB_BYTES // max(per_row, 1))
    c = min(c, n)
    return -(-c // 512) * 512


class _DeviceProduct:
    """One C = A B product, chunked over A's rows with uniform shapes.

    Holds the device-side padded output ([w_cap, n_pad] per chunk) so a
    following product can consume it WITHOUT readback (rap_device feeds
    AP straight into P^T * AP)."""

    def __init__(self, n_rows, n_cols, chunks, counts, w_cap):
        self.n_rows, self.n_cols = n_rows, n_cols
        self.chunks = chunks          # list of (cols_dev [w_cap, C], vals_dev)
        self.counts = counts          # np [n_rows]
        self.w_cap = w_cap

    @property
    def nnz(self) -> int:
        return int(self.counts.sum())

    def to_ell(self):
        """Concatenate chunk outputs into one [w_cap, n_pad] device ELL
        (cols, vals) — the exact operand format of ell_spgemm."""
        cols = jnp.concatenate([c for c, _ in self.chunks], axis=1)
        vals = jnp.concatenate([v for _, v in self.chunks], axis=1)
        return cols, vals

    def to_csr(self, out_dtype=np.float64) -> CSRMatrix:
        cols = np.concatenate([np.asarray(c) for c, _ in self.chunks],
                              axis=1)
        vals = np.concatenate([np.asarray(v) for _, v in self.chunks],
                              axis=1)
        return _assemble_csr(self.n_rows, self.n_cols, cols, vals,
                             self.counts, out_dtype)


def _run_dia(offsets, dv, bc, bv, n_rows, n_cols_out, w_cap, dtype):
    """Chunked DIA x ELL: host prepads B so every chunk window is one
    static slice; all chunks share one compiled program."""
    K, n = dv.shape
    dmin, dmax = int(offsets[0]), int(offsets[-1])
    span = dmax - dmin
    rel = tuple(int(d) - dmin for d in offsets)
    C = _chunk_rows(n, K * bc.shape[0], dv.dtype.itemsize)
    n_pad = -(-n // C) * C
    # padded B: bp[:, j] = b[:, j + dmin] over j in [0, n_pad + span)
    lo = max(0, -dmin)
    bc_p = np.pad(bc[:, max(0, dmin):min(bc.shape[1], n_pad + dmax)],
                  ((0, 0), (lo, 0)), constant_values=SENT)
    bv_p = np.pad(bv[:, max(0, dmin):min(bv.shape[1], n_pad + dmax)],
                  ((0, 0), (lo, 0)))
    need = n_pad + span
    if bc_p.shape[1] < need:
        pad = need - bc_p.shape[1]
        bc_p = np.pad(bc_p, ((0, 0), (0, pad)), constant_values=SENT)
        bv_p = np.pad(bv_p, ((0, 0), (0, pad)))
    dv_p = np.zeros((K, n_pad), dtype=dtype)
    dv_p[:, :n] = dv
    bc_d = jnp.asarray(bc_p)
    bv_d = jnp.asarray(bv_p.astype(dtype))
    chunks, counts, mx = [], [], 0
    for s in range(0, n_pad, C):
        win_c = bc_d[:, s:s + C + span]
        win_v = bv_d[:, s:s + C + span]
        cols_d, vals_d, cnt, m = _jit_dia(
            rel, jnp.asarray(dv_p[:, s:s + C]), win_c, win_v,
            w_cap=w_cap)
        chunks.append((cols_d, vals_d))
        counts.append(cnt)
        mx = max(mx, int(m))
    if mx > w_cap:
        return None, mx
    counts = np.concatenate([np.asarray(c) for c in counts])[:n_rows]
    return _DeviceProduct(n_rows, n_cols_out, chunks, counts, w_cap), mx


def _run_ell(ac, av, bc_d, bv_d, n_rows, n_cols_out, w_cap, dtype):
    """Chunked ELL x ELL; B stays device-resident across chunks (it may
    already BE a device array from a previous product)."""
    Wa, n = ac.shape
    Wb = bc_d.shape[0]
    C = _chunk_rows(n, Wa * Wb, np.dtype(dtype).itemsize)
    n_pad = -(-n // C) * C
    if n_pad > n:
        ac = np.pad(ac, ((0, 0), (0, n_pad - n)), constant_values=SENT)
        av = np.pad(av, ((0, 0), (0, n_pad - n)))
    chunks, counts, mx = [], [], 0
    for s in range(0, n_pad, C):
        cols_d, vals_d, cnt, m = _jit_ell(
            jnp.asarray(ac[:, s:s + C]),
            jnp.asarray(av[:, s:s + C].astype(dtype, copy=False)),
            bc_d, bv_d, w_cap=w_cap)
        chunks.append((cols_d, vals_d))
        counts.append(cnt)
        mx = max(mx, int(m))
    if mx > w_cap:
        return None, mx
    counts = np.concatenate([np.asarray(c) for c in counts])[:n_rows]
    return _DeviceProduct(n_rows, n_cols_out, chunks, counts, w_cap), mx


def _cap_guess(a_max_row: int, b_max_row: int, n_cols: int) -> int:
    """Initial width cap; an overflow re-runs once with the exact max."""
    return int(min(max(16, a_max_row + 4 * b_max_row),
                   a_max_row * b_max_row, n_cols))


def _max_row(a: CSRMatrix) -> int:
    return max(1, int(np.diff(a.indptr).max()) if a.nnz else 1)


def spgemm_device(a: CSRMatrix, b: CSRMatrix, dtype=None,
                  w_cap: Optional[int] = None) -> CSRMatrix:
    """C = A B computed on the default JAX device.  Matches the host
    kernel's canonical output (sorted, deduped, |c| <= ZERO_TOL dropped)
    up to summation-order roundoff in `dtype`."""
    return _product(a, b, dtype, w_cap).to_csr()


def _product(a: CSRMatrix, b: CSRMatrix, dtype=None,
             w_cap: Optional[int] = None) -> "_DeviceProduct":
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    dtype = np.dtype(dtype)
    if w_cap is None:
        w_cap = _cap_guess(_max_row(a), _max_row(b), b.n_cols)
    bc, bv = csr_to_ell(b, dtype=dtype)
    dia = csr_to_dia(a)
    for attempt in range(2):
        if dia is not None:
            prod, mx = _run_dia(dia[0], dia[1].astype(dtype), bc, bv,
                                a.n_rows, b.n_cols, w_cap, dtype)
        else:
            ac, av = csr_to_ell(a, dtype=dtype)
            prod, mx = _run_ell(ac, av, jnp.asarray(bc),
                                jnp.asarray(bv), a.n_rows, b.n_cols,
                                w_cap, dtype)
        if prod is not None:
            return prod
        w_cap = int(mx)        # exact width; one recompile
    raise CapOverflow(f"row width {mx} > cap {w_cap}")


def rap_device(a: CSRMatrix, p: CSRMatrix, dtype=None,
               need_ap: bool = True):
    """(AP, Ac = P^T A P, ap_nnz) with both products on device.

    AP never leaves the chip between the two products: its padded
    [w_cap, n] output IS the ELL operand of the P^T * AP product (same
    SENT/0 padding convention).  P^T is packed on the host (one cheap
    structural transpose of P).  Raises CapOverflow on pathological
    width overflow; the caller (ParRugeStubenSolver.extend_hierarchy)
    falls back to the native host kernel for that level."""
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    dtype = np.dtype(dtype)
    app = _product(a, p, dtype=dtype)
    pt = p.transpose()
    ptc, ptv = csr_to_ell(pt, dtype=dtype)
    apc_d, apv_d = app.to_ell()
    # the second product's candidate slab scales with AP's ELL operand
    # width: truncate it to the MEASURED max AP row width (counts are
    # already on the host; rows beyond them are SENT/0 padding, so the
    # slice is lossless) instead of the first product's cap guess
    ap_max_row = max(1, int(app.counts.max()) if len(app.counts) else 1)
    if ap_max_row < apc_d.shape[0]:
        apc_d, apv_d = apc_d[:ap_max_row], apv_d[:ap_max_row]
    w_cap = _cap_guess(_max_row(pt), ap_max_row, p.n_cols)
    for attempt in range(2):
        prod, mx = _run_ell(ptc, ptv, apc_d, apv_d, pt.n_rows, p.n_cols,
                            w_cap, dtype)
        if prod is not None:
            ap = app.to_csr() if need_ap else None
            return ap, prod.to_csr(), app.nnz
        w_cap = int(mx)
    raise CapOverflow(f"row width {mx} > cap {w_cap}")
