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
               lane_pad: int = 1,
               dtype=np.float64) -> Tuple[np.ndarray, np.ndarray]:
    """Pack a CSR block into transposed-ELL [W, rows_pad] cols/vals."""
    row_nnz = np.diff(a.indptr)
    w = int(row_nnz.max()) if a.nnz else 0
    if width is None:
        width = max(1, w)
    assert w <= width, f"row width {w} exceeds requested {width}"
    rows_pad = _round_up(max(rows_pad, a.n_rows, 1), lane_pad)
    cols = np.zeros((width, rows_pad), dtype=np.int32)
    vals = np.zeros((width, rows_pad), dtype=dtype)
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


# --- windowed ELL (transfer operators / matrices with narrow per-tile spans) --
#
# Per-entry ELL gathers are ~1000x slower than streaming on TPU, but the
# matrices that fall back to ELL (3-D extended+i prolongators and their
# transposes; reference ruge_stuben/par_interpolation.cpp:301) have
# LOCAL column footprints: every tile of ba*128 consecutive rows reads x
# only inside a window of WR 128-element blocks (the distance-2 grid
# neighborhood). Windowed ELL stores, per tile, the window start plus
# window-relative column ids; the Pallas kernel (wind_ell_spmv_pallas)
# DMAs the x window into VMEM once per tile and resolves every entry with
# a lane gather + select scan over the WR window rows — streaming VPU
# work, no general gathers. This is the TPU-native kernel for P apply /
# P^T apply (reference util/linalg/par_spmv.cpp:91-209).

def _wind_slot_assign(q, rows, tid, row_nnz, W, T):
    """Assign each CSR entry to an ELL slot so per-(tile, slot)
    window-row bands stay narrow.

    The slot of an entry is free per row (any injective map keeps the
    layout valid: a slot holds at most one entry per row, and the SpMV
    sums slots). Column-sorted position (the naive choice) smears slot
    w's band across rows of different lengths; bucketing slots by the
    entry's position in the TILE's window-row range instead makes slot
    w ~functional in q — on the 128^3 transposed prolongator the
    bounded-kernel scan drops 8.76M -> 1.80M (tile, slot, row) steps.
    Within a row (entries q-sorted), targets are made strictly
    increasing by a running max, then capped into [0, W-1]."""
    k = np.arange(len(q)) - np.repeat(
        np.cumsum(np.concatenate([[0], row_nnz[:-1]])), row_nnz)
    tlo = np.full(T, np.iinfo(np.int64).max, dtype=np.int64)
    thi = np.full(T, -1, dtype=np.int64)
    np.minimum.at(tlo, tid, q)
    np.maximum.at(thi, tid, q)
    span = np.maximum(1, thi - tlo)
    t_e = np.minimum(W - 1, (q - tlo[tid]) * W // span[tid])
    # per-row running max via a row-offset segmented scan: BIG need only
    # exceed the value range of (t_e - k), i.e. W + max(row_nnz); a fixed
    # 2^40 offset overflows int64 past ~2^23 rows (256^3 operators)
    BIG = np.int64(W + int(row_nnz.max(initial=1)) + 2)
    assert int(rows[-1] if len(rows) else 0) < np.iinfo(np.int64).max // BIG
    fwd = np.maximum.accumulate(t_e - k + rows * BIG) - rows * BIG
    s = k + np.minimum(fwd, W - np.repeat(row_nnz, row_nnz))
    return s


def wind_ell_stats(a: CSRMatrix, rows_pad: int, ba: int):
    """(W, WR, T, scan) for the windowed-ELL layout at tile size ba*128.

    W is the ELL row width; WR the max per-tile column-window height in
    128-blocks, measured from the 8-aligned window base (8-sublane DMA
    tiling) and rounded up to a multiple of 8. ``scan`` is the total
    kernel scan work in (tile, slot, window-row) steps under the
    per-slot dynamic bounds (wind_ell_arrays jlo/jhi) with the bucketed
    slot assignment (_wind_slot_assign): slot w of a tile only spans a
    narrow band of window rows, so scan << W*WR*T for transfer
    operators (the 128^3 transposed prolongator drops ~5x, the forward
    ~7x)."""
    row_nnz = np.diff(a.indptr)
    W = int(row_nnz.max()) if a.nnz else 0
    TR = ba * LANE
    T = -(-_round_up(max(rows_pad, a.n_rows, 1), TR) // TR)
    if a.nnz == 0:
        return W, 8, T, 0
    rows = np.repeat(np.arange(a.n_rows), row_nnz)
    q = (a.indices // LANE).astype(np.int64)
    tid = rows // TR
    lo = np.full(T, np.iinfo(np.int64).max, dtype=np.int64)
    hi = np.zeros(T, dtype=np.int64)
    np.minimum.at(lo, tid, q)
    np.maximum.at(hi, tid, q)
    occ = lo <= hi
    span = int(np.max(hi[occ] - (lo[occ] & ~7) + 1, initial=1))
    # per-(tile, slot) spans = the bounded kernel's true work
    pos = _wind_slot_assign(q, rows, tid, row_nnz, W, T)
    flat = tid * W + pos
    slo = np.full(T * W, np.iinfo(np.int64).max, dtype=np.int64)
    shi = np.full(T * W, -1, dtype=np.int64)
    np.minimum.at(slo, flat, q)
    np.maximum.at(shi, flat, q)
    act = shi >= 0
    scan = int(np.sum(shi[act] - slo[act] + 1))
    return W, int(_round_up(span, 8)), T, scan


def wind_ell_arrays(a: CSRMatrix, rows_pad: int, W: int, WR: int, ba: int,
                    cols_pad: int, dtype=np.float64):
    """Pack CSR into windowed ELL.

    Returns (ws [T] int32 8-aligned window starts (in 128-blocks of the
    source vector), rel [W, R] int32 window-relative cols = col - 128*ws,
    vals [W, R], jlo [T, W] int32, jhi [T, W] int32). R = rows_pad
    rounded up to ba*128. Padding entries have rel 0 / val 0 (they read
    window row 0 lane 0 and contribute nothing). ws is clamped so
    ws + WR never exceeds the padded source height the SpMV wrapper
    builds (wind_src_height). jlo/jhi are the per-(tile, slot)
    window-row scan bounds (half-open) over REAL entries: the Pallas
    kernel scans only rows [jlo, jhi) per slot — with column-sorted CSR
    rows each slot spans a narrow band, a ~10x scan cut on transposed
    3-D prolongators. Empty (tile, slot) pairs get [0, 0)."""
    TR = ba * LANE
    R = _round_up(max(rows_pad, a.n_rows, 1), TR)
    T = R // TR
    cap = max(0, wind_src_height(cols_pad, WR) - WR)
    ws = np.zeros(T, dtype=np.int32)
    rel = np.zeros((W, R), dtype=np.int32)
    vals = np.zeros((W, R), dtype=dtype)
    jlo = np.zeros((T, W), dtype=np.int32)
    jhi = np.zeros((T, W), dtype=np.int32)
    if a.nnz:
        row_nnz = np.diff(a.indptr)
        rows = np.repeat(np.arange(a.n_rows), row_nnz)
        q = (a.indices // LANE).astype(np.int64)
        tid = rows // TR
        pos = _wind_slot_assign(q, rows, tid, row_nnz, W, T)
        lo = np.full(T, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(lo, tid, q)
        lo[lo == np.iinfo(np.int64).max] = 0
        ws[:] = np.minimum(lo & ~7, cap)
        r = a.indices - ws[tid].astype(np.int64) * LANE
        assert r.min() >= 0 and r.max() < WR * LANE, \
            (int(r.min()), int(r.max()), WR * LANE)
        rel[pos, rows] = r
        vals[pos, rows] = a.data
        qrel = q - ws[tid]
        flat = tid * W + pos
        slo = np.full(T * W, np.iinfo(np.int64).max, dtype=np.int64)
        shi = np.full(T * W, -1, dtype=np.int64)
        np.minimum.at(slo, flat, qrel)
        np.maximum.at(shi, flat, qrel)
        act = shi >= 0
        slo[~act] = 0
        jlo[:] = slo.reshape(T, W)
        jhi[:] = (shi + 1).reshape(T, W).clip(min=0)
    return ws, rel, vals, jlo, jhi


def wind_src_height(cols_pad: int, WR: int) -> int:
    """Padded source-vector height (in 128-blocks) the windowed SpMV
    uses: both the host packer (for clamping ws) and the device wrapper
    compute it with this one formula."""
    return _round_up(max(-(-cols_pad // LANE), WR), 8)


def wind_ell_cols(ws: jnp.ndarray, rel: jnp.ndarray, ba: int) -> jnp.ndarray:
    """Reconstruct absolute ELL cols [W, R] from the windowed layout."""
    W, R = rel.shape
    T = R // (ba * LANE)
    return (rel.reshape(W, T, ba * LANE)
            + ws[None, :, None].astype(rel.dtype) * LANE).reshape(W, R)


def wind_ell_spmv(ws: jnp.ndarray, rel: jnp.ndarray, vals: jnp.ndarray,
                  x: jnp.ndarray, ba: int, WR: int,
                  rows_pad: int) -> jnp.ndarray:
    """XLA reference/fallback for windowed ELL (CPU meshes, f64)."""
    cols = wind_ell_cols(ws, rel, ba)
    need = wind_src_height(x.shape[0], WR) * LANE
    x2 = jnp.pad(x, (0, need - x.shape[0]))
    return (vals * x2[cols]).sum(axis=0)[:rows_pad]


# --- sorted-scatter windowed transpose (the "wellt" restriction format) ------
#
# The restriction kernel's answer to util/linalg/par_spmv.cpp:157-209
# (mult_T). The FORWARD matrix B (rows = x domain, cols = targets; for a
# restriction operator A = P^T this is P itself) is tiled in 128 source
# rows; each tile's entries are SORTED BY TARGET 128-ROW-BLOCK at pack
# time and compacted into slots of 128 entries whose targets all fall in
# one aligned SWELLT_AMAX-row output window. The device kernel then
# resolves a whole slot with one lane gather (x values; source row ==
# lane position is free at tile size 128), one one-hot MXU scatter, and
# one dynamic 32-row accumulate into the VMEM-resident output — no
# per-window-row scanning at all. Round-5 silicon: 8.5 ms at 128^3
# (8.45M nnz) vs 45.6 ms for the best scan-based formulation.

SWELLT_AMAX = 32        # output rows per slot window (multiple of 8)


def swellt_height(n_out: int) -> int:
    """Padded output height (in 128-blocks): every slot's window
    [qb, qb + SWELLT_AMAX) must stay in bounds."""
    return _round_up(-(-max(n_out, 1) // LANE) + SWELLT_AMAX, 8)


def _swellt_entries(a: CSRMatrix):
    """Per-entry (tile, qblock-key, srcl, qrel, lout) in sorted slot
    order plus the group partition. Shared by stats and pack."""
    row_nnz = np.diff(a.indptr)
    rows = np.repeat(np.arange(a.n_rows), row_nnz)
    tid = rows >> 7
    srcl = rows & 127
    hc = (a.indices // LANE).astype(np.int64)
    lout = a.indices % LANE
    qb = (hc // SWELLT_AMAX) * SWELLT_AMAX
    nq = int(qb.max()) // SWELLT_AMAX + 1 if a.nnz else 1
    key = tid.astype(np.int64) * nq + qb // SWELLT_AMAX
    order = np.argsort(key, kind="stable")
    return (tid, srcl, hc, lout, qb, key, order, nq)


def swellt_stats(a: CSRMatrix) -> Tuple[int, int]:
    """(T, Kp): tile count and max slots per tile — no sort needed, so
    cheap enough for format candidacy."""
    T = max(1, -(-a.n_rows // LANE))
    if a.nnz == 0:
        return T, 0
    row_nnz = np.diff(a.indptr)
    rows = np.repeat(np.arange(a.n_rows), row_nnz)
    tid = rows >> 7
    qi = (a.indices // (LANE * SWELLT_AMAX)).astype(np.int64)
    nq = int(qi.max()) + 1
    cnt = np.bincount(tid * nq + qi, minlength=T * nq)
    slots = -(-cnt // LANE)
    Kp = int(slots.reshape(T, nq).sum(axis=1).max())
    return T, Kp


def swellt_arrays(a: CSRMatrix, Kp: int, dtype=np.float64):
    """Pack the forward matrix into the sorted-scatter layout.

    Returns (meta [T, Kp*128] int32, vals [T, Kp*128], qb [T*Kp]
    int32). meta packs srcl | qrel << 7 | lout << 12. Padding entries
    carry val 0 / meta 0 / qb 0 (they accumulate zero into window row 0
    lane 0)."""
    T = max(1, -(-a.n_rows // LANE))
    meta = np.zeros((T, Kp * LANE), dtype=np.int32)
    vals = np.zeros((T, Kp * LANE), dtype=dtype)
    qbs = np.zeros(T * Kp, dtype=np.int32)
    if a.nnz == 0 or Kp == 0:
        return meta, vals, qbs
    tid, srcl, hc, lout, qb, key, order, nq = _swellt_entries(a)
    tid, srcl, lout, qb, key = (v[order] for v in (tid, srcl, lout, qb,
                                                   key))
    qrel = (hc - (hc // SWELLT_AMAX) * SWELLT_AMAX)[order]
    data = a.data[order]
    n = len(key)
    new = np.empty(n, dtype=bool)
    new[0] = True
    new[1:] = key[1:] != key[:-1]
    gid = np.cumsum(new) - 1
    gstart = np.flatnonzero(new)
    p = np.arange(n) - gstart[gid]
    sig = p // LANE                       # slot within its group
    e = p % LANE                          # lane position within slot
    gsize = np.diff(np.append(gstart, n))
    gslots = -(-gsize // LANE)
    gtile = tid[gstart]
    cum = np.cumsum(gslots) - gslots
    tfirst = np.flatnonzero(np.r_[True, gtile[1:] != gtile[:-1]])
    tbase = np.repeat(cum[tfirst],
                      np.diff(np.append(tfirst, len(gslots))))
    k = (cum - tbase)[gid] + sig          # slot index within the tile
    assert int(k.max()) < Kp, (int(k.max()), Kp)
    meta[tid, k * LANE + e] = (srcl | (qrel << 7) | (lout << 12)) \
        .astype(np.int32)
    vals[tid, k * LANE + e] = data
    qbs[tid * Kp + k] = qb
    return meta, vals, qbs


def _swellt_unpack(meta):
    srcl = meta & 127
    qrel = (meta >> 7) & (SWELLT_AMAX - 1)
    lout = (meta >> 12) & 127
    return srcl, qrel, lout


def swellt_spmv_T(meta: jnp.ndarray, vals: jnp.ndarray,
                  qb: jnp.ndarray, x: jnp.ndarray,
                  n_out: int) -> jnp.ndarray:
    """XLA reference/fallback (CPU meshes, f64): y = B^T x from the
    sorted-scatter layout."""
    T, KL = meta.shape
    Kp = KL // LANE
    srcl, qrel, lout = _swellt_unpack(meta)
    src = jnp.arange(T, dtype=meta.dtype)[:, None] * LANE + srcl
    xp = jnp.pad(x, (0, T * LANE - x.shape[0]))
    c = vals * xp[src]
    qbe = jnp.repeat(qb.reshape(T, Kp), LANE, axis=1)
    tgt = (qbe + qrel) * LANE + lout
    H = swellt_height(n_out)
    y = jnp.zeros(H * LANE, dtype=vals.dtype).at[tgt.reshape(-1)].add(
        c.reshape(-1))
    return y[:n_out]


def swellt_spmv(meta: jnp.ndarray, vals: jnp.ndarray, qb: jnp.ndarray,
                x: jnp.ndarray, cols_pad: int) -> jnp.ndarray:
    """Forward apply y = B x from the sorted-scatter layout (the
    spmv_T path of a wellt-packed restriction operator)."""
    T, KL = meta.shape
    Kp = KL // LANE
    srcl, qrel, lout = _swellt_unpack(meta)
    qbe = jnp.repeat(qb.reshape(T, Kp), LANE, axis=1)
    tgt = (qbe + qrel) * LANE + lout
    H = swellt_height(int(x.shape[0]))
    xp = jnp.pad(x, (0, H * LANE - x.shape[0]))
    c = vals * xp[tgt]
    src = jnp.arange(T, dtype=meta.dtype)[:, None] * LANE + srcl
    y = jnp.zeros(T * LANE, dtype=vals.dtype).at[src.reshape(-1)].add(
        c.reshape(-1))
    return y[:cols_pad]


# --- boundary-compacted off_proc block ----------------------------------------
#
# Off-proc (halo) entries only exist on the shard-boundary rows — a surface,
# not a volume. Storing the off block ELL over ALL rows makes its SpMV a
# full-R gather (TPU gathers are ~100x slower than streaming ops), which
# would dominate the whole solve. Instead the off block is compacted to the
# B boundary rows: gather/scatter cost scales with the halo surface.

def ell_boundary_arrays(a: CSRMatrix, width: int, b_pad: int,
                        rows_pad: int, dtype=np.float64):
    """Pack a CSR block into boundary-compacted ELL.

    Returns (rows [b_pad] int32, cols [width, b_pad] int32,
    vals [width, b_pad]). Row padding slots hold ``rows_pad`` (out of
    bounds: scatter-dropped, and their vals are 0 so clamped gathers
    contribute nothing)."""
    row_nnz = np.diff(a.indptr)
    brows = np.nonzero(row_nnz)[0]
    rows = np.full(b_pad, rows_pad, dtype=np.int32)
    cols = np.zeros((width, b_pad), dtype=np.int32)
    vals = np.zeros((width, b_pad), dtype=dtype)
    if len(brows):
        rows[:len(brows)] = brows
        bn = row_nnz[brows]
        rpos = np.repeat(np.arange(len(brows)), bn)
        pos = np.arange(a.nnz) - np.repeat(a.indptr[brows], bn)
        cols[pos, rpos] = a.indices
        vals[pos, rpos] = a.data
    return rows, cols, vals


def off_spmv(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
             halo: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """b = A_off @ halo over boundary rows only; returns a full [n_rows]
    vector (zeros elsewhere)."""
    out = jnp.zeros(n_rows, dtype=halo.dtype)
    if cols.size == 0:
        return out
    contrib = (vals * halo[cols]).sum(axis=0)           # [B]
    return out.at[rows].add(contrib)                    # OOB pads dropped


def off_spmv_T(rows: jnp.ndarray, cols: jnp.ndarray, vals: jnp.ndarray,
               x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """halo_contrib = A_off^T x: gather x at boundary rows, scatter-add at
    halo cols."""
    if cols.size == 0:
        return jnp.zeros(n_out, dtype=x.dtype)
    xb = x[rows]                                        # clamped pads * 0
    contrib = vals * xb[None, :]
    return jnp.zeros(n_out, dtype=x.dtype).at[cols.reshape(-1)].add(
        contrib.reshape(-1))


# --- DIA (diagonal) format -----------------------------------------------------
#
# XLA's generic gather is catastrophically slow on TPU (~1000x an elementwise
# op), but the matrices AMG spends its time on — stencil operators and their
# shard-local blocks — have a handful of distinct (col - row) offsets. Storing
# those diagonals densely turns SpMV into K shift-multiply-accumulate sweeps:
# pure VPU streaming at HBM bandwidth, zero gathers. This is the TPU-native
# answer to the reference's CSR row loop (util/linalg/spmv.cpp:59).

def dia_detect(a: CSRMatrix, max_offsets: int) -> np.ndarray:
    """Distinct col-row offsets, or None if the block is not DIA-friendly."""
    if a.nnz == 0:
        return np.zeros(0, dtype=np.int64)
    rows = np.repeat(np.arange(a.n_rows), np.diff(a.indptr))
    offs = np.unique(a.indices - rows)
    if len(offs) > max_offsets:
        return None
    return offs


def dia_arrays(a: CSRMatrix, offsets: np.ndarray,
               rows_pad: int, dtype=np.float64) -> np.ndarray:
    """Pack CSR into DIA vals [K, rows_pad] against the (static) offset set:
    vals[k, i] = A[i, i + offsets[k]] (0 where absent). ``dtype`` is the
    device dtype — packing straight into it avoids a second full-size
    staging array + conversion pass."""
    K = len(offsets)
    vals = np.zeros((K, rows_pad), dtype=dtype)
    if a.nnz:
        rows = np.repeat(np.arange(a.n_rows), np.diff(a.indptr))
        entry_offs = a.indices - rows
        k_of = np.searchsorted(offsets, entry_offs)
        # offsets are the detected union over shards (dia_detect), so
        # every entry hits; the O(nnz) verification pass is debug-only
        if __debug__ and len(entry_offs):
            assert np.asarray(offsets)[k_of[0]] == entry_offs[0]
        vals[k_of, rows] = a.data
    return vals


def dia_spmv(offsets: Tuple[int, ...], vals: jnp.ndarray, x: jnp.ndarray,
             pad: int) -> jnp.ndarray:
    """b[i] = sum_k vals[k,i] * x[i + offsets[k]].

    ``offsets`` are STATIC (trace-time) — the per-shard diagonal sets are
    padded to their union at setup, so every shard runs the same program and
    every shifted read is a static ``lax.slice`` that XLA fuses into one
    streaming multiply-accumulate pass (no gathers, no dynamic slices)."""
    R = vals.shape[1]
    x_pad = jnp.pad(x, (pad, pad + max(0, R - x.shape[0])))
    b = jnp.zeros(R, dtype=x.dtype)
    for k, off in enumerate(offsets):
        b = b + vals[k] * jax.lax.slice(x_pad, (off + pad,),
                                        (off + pad + R,))
    return b


def dia_spmv_T(offsets: Tuple[int, ...], vals: jnp.ndarray, x: jnp.ndarray,
               n_out: int, pad: int) -> jnp.ndarray:
    """b[i + offsets[k]] += vals[k, i] * x[i] — static shifted accumulation:
    each diagonal's contribution is zero-padded into alignment and summed."""
    R = vals.shape[1]
    width = 2 * pad + max(R, n_out)
    buf = jnp.zeros(width, dtype=x.dtype)
    for k, off in enumerate(offsets):
        contrib = vals[k] * x[:R]
        buf = buf + jnp.pad(contrib, (off + pad, width - (off + pad) - R))
    return buf[pad:pad + n_out]


# --- BDIA (block-diagonal + lane gather) format --------------------------------
#
# Coarse Galerkin operators (and any banded-but-irregular matrix) have
# entries clustered around the diagonal, but at too many distinct col-row
# offsets for DIA. BDIA quantizes the offset to the 128-lane block:
# an entry (r, c) lives in plane (d, slot) with d = c//128 - r//128, and
# stores only its lane l = c % 128. SpMV is then, per plane, a sublane
# SHIFT of the [*, 128]-shaped x (static slice, like DIA) followed by an
# in-sublane LANE GATHER (the TPU's native dynamic_gather / 128-wide
# shuffle) and an fma — all streaming VPU work, no general gathers.
# This is the TPU-native CSR for quasi-banded sparsity; entries of rows
# needing more than the plane budget do not exist for AMG hierarchies
# (the packer rejects such matrices and the caller keeps ELL).

LANE = 128


def _bdia_d_slot(a: CSRMatrix):
    """Per-entry (d, slot) in CSR order: d = block offset, slot = occurrence
    index among a row's entries sharing d (consecutive in sorted CSR)."""
    rows = np.repeat(np.arange(a.n_rows), np.diff(a.indptr))
    d = a.indices // LANE - rows // LANE
    r128 = max(1, (a.n_rows + LANE - 1) // LANE)
    c128 = max(1, (a.n_cols + LANE - 1) // LANE)
    key = rows * np.int64(r128 + c128 + 3) + (d + r128)
    new = np.concatenate(([True], key[1:] != key[:-1]))
    run_id = np.cumsum(new) - 1
    run_start = np.nonzero(new)[0]
    slot = np.arange(len(key)) - run_start[run_id]
    return rows, d, slot


def bell_stats(a: CSRMatrix):
    """(W_b, n_slots) for the BELL layout: per-target-128-block count of
    (block-offset, occurrence) plane slots. W_b is the padded slot width
    (max over target blocks)."""
    if a.nnz == 0:
        return 0, 0
    rows, d, slot = _bdia_d_slot(a)
    blk = (rows // LANE).astype(np.int64)
    c128 = max(1, (a.n_cols + LANE - 1) // LANE)
    span = np.int64(int(slot.max()) + 2)
    key = (blk * np.int64(2 * c128 + 3) + (d + c128)) * span + slot
    uk = np.unique(key)
    u_blk = uk // (np.int64(2 * c128 + 3) * span)
    a128 = max(1, (a.n_rows + LANE - 1) // LANE)
    counts = np.bincount(u_blk.astype(np.int64), minlength=a128)
    return int(counts.max()), int(len(uk))


def bell_arrays(a: CSRMatrix, a128: int, w_b: int, dtype=np.float64):
    """Pack CSR into BELL (block-ELL of plane slots): for each target
    128-row block, up to W_b slots, each holding ONE source 128-column
    block with per-row lane ids and values.

    Returns (src [W_b, a128] int32 source block ids (pad: 0, vals 0),
    idx [W_b, a128, 128] int8 lane ids, vals [W_b, a128, 128]).

    SpMV is then slot-parallel: gather the source row-blocks of x
    (the same row-block gather the embedded transfer operators use),
    lane-gather within each block (the TPU's native 128-wide shuffle),
    fma, and sum over W_b — streaming passes sized by OCCUPIED blocks,
    where full BDIA planes would stream every block of every plane
    (fill as low as 0.1 on unstructured coarse Galerkin operators) and
    the ELL fallback would gather per entry."""
    src = np.zeros((w_b, a128), dtype=np.int32)
    idx = np.zeros((w_b, a128, LANE), dtype=np.int8)
    vals = np.zeros((w_b, a128, LANE), dtype=dtype)
    if a.nnz == 0 or w_b == 0:
        return src, idx, vals
    rows, d, slot = _bdia_d_slot(a)
    blk = (rows // LANE).astype(np.int64)
    srcb = (a.indices // LANE).astype(np.int64)
    lane = (a.indices % LANE).astype(np.int64)
    sub = (rows % LANE).astype(np.int64)
    c128 = max(1, (a.n_cols + LANE - 1) // LANE)
    span = np.int64(int(slot.max()) + 2)
    key = (blk * np.int64(2 * c128 + 3) + (d + c128)) * span + slot
    uk, first, inv = np.unique(key, return_index=True,
                               return_inverse=True)
    u_blk = blk[first]
    u_src = srcb[first]
    counts = np.bincount(u_blk, minlength=a128)
    starts = np.cumsum(counts) - counts
    # uk is sorted block-major, so slot rank within its block:
    w_of = np.arange(len(uk)) - starts[u_blk]
    src[w_of, u_blk] = u_src
    w_e = w_of[inv]
    b_e = blk
    idx[w_e, b_e, sub] = lane
    vals[w_e, b_e, sub] = a.data
    return src, idx, vals


def bell_spmv(src: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray,
              x: jnp.ndarray, rows_pad: int) -> jnp.ndarray:
    """b = A x for a BELL block: per slot-layer, row-block gather + lane
    gather + fma, accumulated over the W_b layers by a ``fori_loop``.
    Padding slots read x-block 0 with vals 0.

    The loop (not one fused mega-gather) is load-bearing: a single
    [W*A128, 128] take_along_axis makes XLA materialize multi-GB index
    temporaries; per-layer [A128, 128] gathers are the same shape class
    as the embedded-operator row-block gather and stream cleanly."""
    W, A128 = src.shape
    C128 = -(-x.shape[0] // LANE)
    x2 = jnp.pad(x, (0, C128 * LANE - x.shape[0])).reshape(C128, LANE)
    idx32 = idx.astype(jnp.int32)

    def layer(w):
        wrow = x2[src[w]]                           # [A128, 128]
        return vals[w] * jnp.take_along_axis(wrow, idx32[w], axis=1)

    # carry starts from layer 0 (derived from the inputs, so it has the
    # same mesh-varying type as the loop body under shard_map)
    out = jax.lax.fori_loop(1, W, lambda w, o: o + layer(w), layer(0))
    return out.reshape(-1)[:rows_pad]


def bdia_plane_counts(a: CSRMatrix):
    """All (d, slot) planes of a matrix with their entry counts:
    returns (planes [(d, slot), ...], counts np.ndarray)."""
    if a.nnz == 0:
        return [], np.zeros(0, dtype=np.int64)
    _, d, slot = _bdia_d_slot(a)
    span = np.int64(slot.max() + 2)
    key = d.astype(np.int64) * span + slot
    uniq, counts = np.unique(key, return_counts=True)
    dq = np.floor_divide(uniq, span)
    planes = [(int(dv), int(s)) for dv, s in zip(dq, uniq - dq * span)]
    return planes, counts


def bdia_plane_spec(a: CSRMatrix, max_planes: int):
    """Per-matrix plane spec [(d, slot), ...] or None if over budget."""
    planes, _ = bdia_plane_counts(a)
    # planes valid only if slot sets are dense per d (0..max); they are by
    # construction (slot k implies k-1 exists for some row)
    if len(planes) > max_planes:
        return None
    return planes


def select_planes(all_counts: dict, max_planes: int, a128: int,
                  min_fill: float = 0.0015):
    """Keep planes worth a streaming pass: count >= min_fill * plane
    capacity, ranked by count, capped. A plane (d, s) is only kept if
    (d, s-1) is kept (slot density needed by the packer's slot indexing).

    Returns the kept plane list sorted by (d, slot)."""
    cap = max(1.0, min_fill * a128 * LANE)
    ranked = sorted(all_counts.items(), key=lambda kv: -kv[1])
    kept = set()
    for (dv, s), cnt in ranked:
        if len(kept) >= max_planes:
            break
        if cnt < cap:
            break
        kept.add((dv, s))
    # enforce slot-prefix density: (d, s) kept => (d, s-1) kept
    changed = True
    while changed:
        changed = False
        for (dv, s) in list(kept):
            if s > 0 and (dv, s - 1) not in kept:
                kept.discard((dv, s))
                changed = True
    return sorted(kept)


def bdia_split_rest(a: CSRMatrix, kept) -> CSRMatrix:
    """CSR of the entries NOT covered by the kept planes (the 'rest',
    handled by the compacted-gather path)."""
    if a.nnz == 0:
        return CSRMatrix.empty(a.n_rows, a.n_cols)
    _, d, slot = _bdia_d_slot(a)
    kept_set = set(kept)
    # vectorized membership: key-based
    span = np.int64(max((s for _, s in kept), default=0) + 2 + slot.max())
    kk = np.array(sorted(dv * span + s for dv, s in kept_set),
                  dtype=np.int64)
    ek = d.astype(np.int64) * span + slot
    pos = np.searchsorted(kk, ek)
    pos = np.clip(pos, 0, max(0, len(kk) - 1))
    in_plane = (len(kk) > 0) & (kk[pos] == ek) if len(kk) else \
        np.zeros(len(ek), dtype=bool)
    return a.filter_entries(~in_plane)


def merge_plane_specs(specs):
    """Union of per-shard specs (SPMD uniformity): per d, max slot count."""
    agg = {}
    for spec in specs:
        per_d = {}
        for dv, s in spec:
            per_d[dv] = max(per_d.get(dv, 0), s + 1)
        for dv, cnt in per_d.items():
            agg[dv] = max(agg.get(dv, 0), cnt)
    out = []
    for dv in sorted(agg):
        for s in range(agg[dv]):
            out.append((dv, s))
    return out


def bdia_arrays(a: CSRMatrix, plane_spec, a_pad: int,
                dtype=np.float64):
    """Pack CSR into BDIA planes.

    Returns (idx [P, a_pad, 128] int8 lane ids (lanes < 128), vals
    [P, a_pad, 128]).
    a_pad >= ceil(n_rows/128), in 128-row blocks. Padding slots keep
    idx 0 / val 0."""
    P = len(plane_spec)
    idx = np.zeros((P, a_pad, LANE), dtype=np.int8)
    vals = np.zeros((P, a_pad, LANE), dtype=dtype)
    if a.nnz == 0 or P == 0:
        return idx, vals
    rows, d, slot = _bdia_d_slot(a)
    # plane lookup: planes sorted by key; entries outside the spec are
    # skipped (they live in the 'rest' CSR, see bdia_split_rest)
    span = np.int64(max(s for _, s in plane_spec) + 2 + int(slot.max()))
    plane_keys = np.array([dv * span + s for dv, s in plane_spec],
                          dtype=np.int64)
    order = np.argsort(plane_keys)
    skeys = plane_keys[order]
    entry_keys = d.astype(np.int64) * span + slot
    pos = np.clip(np.searchsorted(skeys, entry_keys), 0, len(skeys) - 1)
    in_spec = skeys[pos] == entry_keys
    rows, pos = rows[in_spec], pos[in_spec]
    a_data = a.data[in_spec]
    a_cols = a.indices[in_spec]
    p_ids = order[pos]
    i = rows // LANE
    j = rows % LANE
    idx[p_ids, i, j] = a_cols % LANE
    vals[p_ids, i, j] = a_data
    return idx, vals


def bdia_spmv(d_offsets: Tuple[int, ...], idx: jnp.ndarray,
              vals: jnp.ndarray, x: jnp.ndarray, padb: int,
              rows_pad: int) -> jnp.ndarray:
    """XLA reference/fallback: per plane, static sublane shift of
    x.reshape(-1, 128) + lane gather + fma. Used on CPU and whenever the
    Pallas kernel is unavailable; the Pallas version streams planes through
    VMEM with the same semantics."""
    P, A_pad, _ = idx.shape
    C128 = -(-x.shape[0] // LANE)
    x2 = jnp.pad(x, (0, C128 * LANE - x.shape[0])).reshape(C128, LANE)
    S_pad = max(A_pad, C128) + 2 * padb
    xp = jnp.pad(x2, ((padb, S_pad - C128 - padb), (0, 0)))
    out = jnp.zeros((A_pad, LANE), dtype=x.dtype)
    idx = idx.astype(jnp.int32)     # XLA gather wants int32+
    for p, d in enumerate(d_offsets):
        w = jax.lax.slice(xp, (padb + d, 0), (padb + d + A_pad, LANE))
        out = out + vals[p] * jnp.take_along_axis(w, idx[p], axis=1)
    return out.reshape(-1)[:rows_pad]
