"""Device-side extended+i interpolation (the dominant setup phase on
chip, like device/spgemm.py moved the Galerkin RAP).

The host/reference algorithm (ruge_stuben/interpolation.py:
extended_interpolation, mirroring interpolation.cpp:9-205 and
par_interpolation.cpp:301-1010) walks, per F row i, a distance-2
pattern with per-pair denominators — a pointer-chasing loop that runs
at ~2.4 Mnnz/s on this host's ONE core (23 s of the 46 s 128^3 setup).

TPU-native formulation.  Everything reduces to the expand/sort/merge
machinery of device/spgemm.py plus two structural observations:

  * P's row pattern is strong-C(i) ∪ strong-C(k) over strong-F
    neighbors k — ONE ell_spgemm-style expand (gather SC rows by SF
    cols) merged with SC itself.
  * For a strong-F neighbor k, every strong-C column of k is in the
    pattern BY CONSTRUCTION.  So the per-pair denominator
       D_ik = Σ_{j ∈ pattern(i) ∪ {i}, sign-ok} a_kj
    splits into  dsc_k (row constant, no membership test needed)
    + the few WEAK-C sign-ok entries of k (membership via a tiny
    broadcast compare against the sorted pattern) + the host-sampled
    a_ki term.  No hash tables, no sorted searches — the only
    membership tests ride on widths of a handful.

Per row chunk, ONE jitted program computes: pattern merge -> D ->
ratios r_ik = a_ik / D_ik (the reference's ZERO_TOL branch folds a_ik
into the weak sum and keeps the tiny D as the multiplier, mirrored
exactly) -> weak sums (incl. the "+i" a_ki fold-back and the
in-pattern weak-C correction) -> contribution expand masked to the
pattern -> final merge and the -1/weak_sum scaling.

Precision contract matches device RAP: f64 on CPU meshes (tests pin
pattern-exact, values to roundoff vs the host kernel), f32 on the TPU
(a ~1e-7 relative perturbation of P is harmless to a preconditioner —
the outer iteration measures f64 residuals against the exact fine A).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.types import CFState, ZERO_TOL
from raptor_tpu.device.spgemm import SENT, _merge_compact

S_, F = CFState.Selected, CFState.Unselected

# per-chunk candidate-slab byte budget (cols+vals each)
_SLAB_BYTES = 192 * 1024 * 1024


class InterpOverflow(Exception):
    """Pattern width exceeded the device cap; caller falls back to the
    native host kernel (correctness never at risk)."""


# --- host packing -------------------------------------------------------------

def _ell_from_subset(n: int, rows: np.ndarray, cols: np.ndarray,
                     vals: np.ndarray, dtype, w_min: int = 1
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """[W, n] ELL (slot major) from entry subset in CSR order."""
    cnt = np.bincount(rows, minlength=n)
    W = max(w_min, int(cnt.max()) if len(rows) else w_min)
    starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(cnt, out=starts[1:])
    pos = np.arange(len(rows), dtype=np.int64) - starts[rows]
    c = np.full((W, n), SENT, dtype=np.int32)
    v = np.zeros((W, n), dtype=dtype)
    c[pos, rows] = cols
    v[pos, rows] = vals
    return c, v


def _prep(a: CSRMatrix, strong: np.ndarray, states: np.ndarray, dtype):
    """All host-side operands for the device pipeline.  The native C
    pass is the fast path (one walk over A's entries; the NumPy below is
    its oracle/fallback and costs ~40x at 128^3 on this host)."""
    n = a.n_rows
    indptr, indices, data = a.sorted_csr()
    from raptor_tpu import native
    if native.available():
        return native.interp_dev_prep(indptr, indices, data,
                                      np.asarray(strong), states)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    strongb = strong.view(np.int8).astype(bool) if strong.dtype != bool \
        else strong
    offd = indices != rows
    st_col = states[indices]
    cstate = st_col == S_
    fstate = st_col == F
    f_row = states[rows] == F

    diag = np.zeros(n)
    dmask = ~offd
    diag[rows[dmask]] = data[dmask]
    sgn = np.where(diag < 0, -1.0, 1.0)
    sign_ok = data * sgn[rows] < 0

    def pack(mask, w_min=1):
        m = mask & f_row
        return _ell_from_subset(n, rows[m], indices[m], data[m], dtype,
                                w_min)

    sc_c, sc_v = pack(strongb & cstate)            # strong C entries
    sf_m = strongb & fstate & f_row                # strong F entries
    sf_rows, sf_cols, sf_vals = rows[sf_m], indices[sf_m], data[sf_m]
    sf_c, sf_v = _ell_from_subset(n, sf_rows, sf_cols, sf_vals, dtype)
    bcs_m = sign_ok & cstate & strongb & f_row     # -> dsc row sums
    bcw_c, bcw_v = pack(sign_ok & cstate & ~strongb)
    awc_c, awc_v = pack(~strongb & cstate & offd)

    dsc = np.bincount(rows[bcs_m], weights=data[bcs_m], minlength=n)
    # BCS rows gathered by SF cols in the contribution expand
    bcs_c, bcs_v = pack(bcs_m)

    # weak-sum base: diag + all non-strong off-diag entries of F rows
    # toward non-isolated columns (NoNeighbors excluded,
    # par_interpolation.cpp:831-838); the in-pattern weak-C part is
    # subtracted on device
    wm = ~strongb & offd & f_row & (st_col != CFState.NoNeighbors)
    wsum0 = diag + np.bincount(rows[wm], weights=data[wm], minlength=n)

    # transpose samples a_ki per SF pair (k = pair col, i = pair row):
    # CSR with sorted rows AND in-row sorted cols makes row*n+col a
    # globally sorted key -> one searchsorted for all pairs
    key = rows * n + indices
    want = sf_cols * n + sf_rows
    loc = np.searchsorted(key, want)
    loc_c = np.minimum(loc, len(key) - 1)
    hit = (len(key) > 0) & (key[loc_c] == want)
    a_ki = np.where(hit, data[loc_c], 0.0)
    di = np.where(a_ki * sgn[sf_cols] < 0, a_ki, 0.0)   # D's i-term
    di_c, di_v = _ell_from_subset(n, sf_rows, sf_cols, di, dtype)
    at_c, at_v = _ell_from_subset(n, sf_rows, sf_cols, a_ki, dtype)
    assert (di_c == sf_c).all() and (at_c == sf_c).all()

    # exact per-row pattern bound: |SC_i| + Σ_{k in SF_i} |SC_k|
    sc_cnt = np.bincount(rows[strongb & cstate], minlength=n)
    bound = np.bincount(rows[strongb & cstate & f_row], minlength=n)
    np.add.at(bound, sf_rows, sc_cnt[sf_cols])
    return dict(sc=(sc_c, sc_v), sf=(sf_c, sf_v), di_v=di_v, at_v=at_v,
                bcs=(bcs_c, bcs_v), bcw=(bcw_c, bcw_v),
                awc=(awc_c, awc_v), dsc=dsc, wsum0=wsum0,
                p_bound=int(bound.max()) if n else 1)


# --- the device kernel --------------------------------------------------------

def _interp_chunk(sc_c, sc_v, sf_c, sf_v, di_v, awc_c, awc_v,
                  wsum0, scg_c, bcs_c, bcs_v, bcw_c, bcw_v, dsc,
                  p_cap: int, ztol: float):
    """One row chunk with the PRODUCTION (parallel) extended+i
    semantics (par_interpolation.cpp:719-841; see the host kernel's
    docstring for the serial-vs-parallel differences).  Chunk-local
    slabs are [W, C]; gather sources (scg/bcs/bcw/dsc) are the
    full-width device-resident operands."""
    W_SF, C = sf_c.shape
    active = sf_c != SENT
    safe = jnp.where(active, sf_c, 0)

    # 1. pattern: SC(i) ∪ SC(k) over strong-F k, dist-2 entries at 0
    gp = jnp.take(scg_c, safe, axis=1)                     # [W_SC, W_SF, C]
    gpv = (active[None] & (gp != SENT))
    cand_c = jnp.concatenate(
        [sc_c, jnp.where(gpv, gp, SENT).reshape(-1, C)], axis=0)
    cand_v = jnp.concatenate(
        [sc_v, jnp.zeros((gp.shape[0] * W_SF, C), sc_v.dtype)], axis=0)
    p0c, p0v, counts, mx = _merge_compact(cand_c, cand_v, p_cap, -1.0)

    # 2. denominators D_ik = dsc_k + Σ weak-C-in-pattern + [a_ki sign-ok]
    bw = jnp.take(bcw_c, safe, axis=1)                     # [W_BCW, W_SF, C]
    bwv = jnp.take(bcw_v, safe, axis=1)
    mem_w = ((bw[None] == p0c[:, None, None, :]).any(0)
             & (bw != SENT) & active[None])
    d = (jnp.take(dsc, safe) * active
         + di_v + jnp.where(mem_w, bwv, 0).sum(axis=0))

    # 3. ratios + weak sums. Tiny D: fold a_ik into weak and distribute
    # NOTHING (r = 0 — the parallel reference's else-branch, :781-786);
    # the +i term is SIGN-FILTERED (di_v, not raw a_ki — :797-801)
    tiny = jnp.abs(d) < ztol
    r = jnp.where(tiny, 0.0, sf_v / jnp.where(tiny, 1.0, d)) * active
    aw_m = ((awc_c[None] == p0c[:, None, :]).any(0) & (awc_c != SENT))
    weak = (wsum0
            + jnp.where(tiny & active, sf_v, 0).sum(axis=0)
            + (r * di_v).sum(axis=0)
            - jnp.where(aw_m, awc_v, 0).sum(axis=0))

    # 4. contributions r_ik * a_kj: strong-C(k) needs no mask (always in
    # pattern); weak-C(k) masked by mem_w; PLUS the row's own weak
    # entries whose column is in the pattern (they fold INTO P in the
    # parallel semantics, :727-732); merge into the pattern
    bs = jnp.take(bcs_c, safe, axis=1)                     # [W_BCS, W_SF, C]
    bsv = jnp.take(bcs_v, safe, axis=1)
    bs_ok = (bs != SENT) & active[None]
    fc = jnp.concatenate(
        [p0c, jnp.where(bs_ok, bs, SENT).reshape(-1, C),
         jnp.where(mem_w, bw, SENT).reshape(-1, C),
         jnp.where(aw_m, awc_c, SENT)], axis=0)
    fv = jnp.concatenate(
        [p0v, jnp.where(bs_ok, r[None] * bsv, 0).reshape(-1, C),
         jnp.where(mem_w, r[None] * bwv, 0).reshape(-1, C),
         jnp.where(aw_m, awc_v, 0)], axis=0)
    pc, pv, counts, _ = _merge_compact(fc, fv, p_cap, -1.0)
    ok = jnp.abs(weak) > ztol
    pv = jnp.where(ok[None, :], pv / jnp.where(ok, -weak, 1.0)[None, :],
                   pv)
    return pc, pv, counts, mx


_jit_interp = jax.jit(_interp_chunk, static_argnames=("p_cap", "ztol"))


# --- mod-classical (distance-1) kernel ----------------------------------------

def _mc_chunk(sc_c, sc_v, sf_c, sf_v, wsum0, sgn_all, bag_c, bag_v,
              ztol: float):
    """Mod-classical chunk with the PRODUCTION (parallel) semantics
    (par_interpolation.cpp:1255-1330): pattern IS the strong-C slab (no
    expand, no merge); each strong-F neighbor k's value distributes
    over the C-state entries of its row that land in the pattern,
    sign-filtered by k's OWN diagonal sign (gathered from ``sgn_all``);
    a tiny coarse sum folds a_ik into weak but still distributes its
    raw value (:1292); there is no +i term; contributions accumulate
    onto existing slots."""
    active = sf_c != SENT
    safe = jnp.where(active, sf_c, 0)
    ba = jnp.take(bag_c, safe, axis=1)                 # [W_BA, W_SF, C]
    bav = jnp.take(bag_v, safe, axis=1)
    sgnk = jnp.take(sgn_all, safe)                     # [W_SF, C]
    sok = ((bav * sgnk[None] < 0) & (ba != SENT) & active[None])
    mem = (ba[None] == sc_c[:, None, None, :])   # [W_SC, W_BA, W_SF, C]
    hit = mem.any(axis=0) & sok                        # [W_BA, W_SF, C]
    d = jnp.where(hit, bav, 0).sum(axis=0)             # [W_SF, C]
    tiny = jnp.abs(d) < ztol
    ratio = jnp.where(tiny, d, sf_v / jnp.where(tiny, 1.0, d)) * active
    weak = wsum0 + jnp.where(tiny & active, sf_v, 0).sum(axis=0)
    contrib = jnp.where(mem & hit[None],
                        ratio[None, None] * bav[None], 0).sum(axis=(1, 2))
    return (sc_v + contrib) / (-weak)[None, :]


_jit_mc = jax.jit(_mc_chunk, static_argnames=("ztol",))


def mod_classical_interp_device(a: CSRMatrix, strong: np.ndarray,
                                states: np.ndarray,
                                col_to_new: np.ndarray, n_coarse: int,
                                variables=None, num_variables: int = 1,
                                dtype=None) -> CSRMatrix:
    """P (modified classical) with the distribution work on the default
    JAX device.  Pattern and counts come straight from the strong-C
    slab; only the values are computed on device."""
    from raptor_tpu import native
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    dtype = np.dtype(dtype)
    n = a.n_rows
    states = np.asarray(states)
    indptr, indices, data = a.sorted_csr()
    ops = native.interp_dev_prep_mc(indptr, indices, data,
                                    np.asarray(strong), states,
                                    variables, num_variables)
    sc_c, sc_v = ops["sc"]
    sf_c, sf_v = ops["sf"]
    ba_c, ba_v = ops["ba"]
    W_SC, W_SF, W_BA = sc_c.shape[0], sf_c.shape[0], ba_c.shape[0]

    w_slot = max(1, W_SC * W_BA * W_SF // 8)  # membership compare volume
    C = max(512, _SLAB_BYTES // max(w_slot * 8, 1))
    C = min(-(-C // 512) * 512, -(-n // 512) * 512)
    n_pad = -(-n // C) * C

    def padded(x, fill=0):
        return np.pad(x, ((0, 0), (0, n_pad - n)), constant_values=fill)

    # single upload per operand, device-side chunk slices (see the
    # extended driver for the relay-cost rationale)
    bag_c = jnp.asarray(padded(ba_c, SENT))
    bag_v = jnp.asarray(padded(ba_v.astype(dtype)))
    sc_cd = jnp.asarray(padded(sc_c, SENT))
    sc_vd = jnp.asarray(padded(sc_v.astype(dtype)))
    sf_cd = jnp.asarray(padded(sf_c, SENT))
    sf_vd = jnp.asarray(padded(sf_v.astype(dtype)))
    wsum0d = jnp.asarray(np.pad(ops["wsum0"],
                                (0, n_pad - n)).astype(dtype))
    sgnd = jnp.asarray(np.pad(ops["sgn"], (0, n_pad - n)).astype(dtype))

    # dispatch all chunks, then read back (see extended_interp_device)
    outs = [
        _jit_mc(sc_cd[:, s:s + C], sc_vd[:, s:s + C],
                sf_cd[:, s:s + C], sf_vd[:, s:s + C],
                wsum0d[s:s + C], sgnd,
                bag_c, bag_v, ztol=float(ZERO_TOL))
        for s in range(0, n_pad, C)]
    vals = np.concatenate([np.asarray(pv) for pv in outs],
                          axis=1)[:, :n]
    counts = (sc_c != SENT).sum(axis=0)
    return _assemble_p(n, n_coarse, states, sc_c, vals, counts,
                       col_to_new)


def _assemble_p(n, n_coarse, states, cols, vals, counts, col_to_new
                ) -> CSRMatrix:
    """[W, n] device output + per-row counts -> CSR with identity C
    rows (shared by both device interpolation drivers)."""
    c_rows = states == S_
    f_counts = np.where(c_rows, 0, counts)
    row_counts = np.where(c_rows, 1, f_counts)
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(row_counts, out=indptr[1:])
    nnz = int(indptr[-1])
    colsT, valsT = cols.T, vals.T
    mask = np.arange(colsT.shape[1])[None, :] < f_counts[:, None]
    out_c = np.empty(nnz, dtype=np.int64)
    out_v = np.empty(nnz)
    c_pos = indptr[:-1][c_rows]
    sel = np.ones(nnz, dtype=bool)
    sel[c_pos] = False
    out_c[sel] = col_to_new[colsT[mask].astype(np.int64)]
    out_v[sel] = valsT[mask]
    out_c[c_pos] = col_to_new[np.flatnonzero(c_rows)]
    out_v[c_pos] = 1.0
    return CSRMatrix(n, n_coarse, indptr, out_c, out_v)


# --- driver -------------------------------------------------------------------

def extended_interp_device(a: CSRMatrix, strong: np.ndarray,
                           states: np.ndarray, col_to_new: np.ndarray,
                           n_coarse: int, dtype=None) -> CSRMatrix:
    """P (extended+i) with the distance-2 work on the default JAX
    device.  ``strong`` is the i8/bool flag per A entry (aligned with
    A's sorted data); single-variable systems only — the caller gates
    num_variables == 1 and falls back to the host kernel otherwise."""
    if dtype is None:
        dtype = np.float64 if jax.config.jax_enable_x64 else np.float32
    dtype = np.dtype(dtype)
    n = a.n_rows
    states = np.asarray(states)
    ops = _prep(a, np.asarray(strong), states, dtype)

    sc_c, sc_v = ops["sc"]
    sf_c, sf_v = ops["sf"]
    bcs_c, bcs_v = ops["bcs"]
    bcw_c, bcw_v = ops["bcw"]
    awc_c, awc_v = ops["awc"]
    W_SC, W_SF = sc_c.shape[0], sf_c.shape[0]
    W_BCS, W_BCW, W_AWC = bcs_c.shape[0], bcw_c.shape[0], awc_c.shape[0]
    p_cap = max(8, min(ops["p_bound"], n_coarse))

    # widest slab in the kernel: the pattern expand, the final merge, or
    # the boolean membership compares (bool bytes counted at 1/8 the
    # 8-byte col+val slot, hence the //8)
    w_slot = max(W_SC * (1 + W_SF),
                 p_cap + W_SF * (W_BCS + W_BCW),
                 p_cap * (W_BCW * W_SF + W_AWC) // 8)
    C = max(512, _SLAB_BYTES // max(w_slot * 8, 1))
    C = min(-(-C // 512) * 512, -(-n // 512) * 512)
    n_pad = -(-n // C) * C

    def padded(x, fill=0):
        return np.pad(x, ((0, 0), (0, n_pad - n)), constant_values=fill)

    # every operand is uploaded ONCE (dtype-converted on the host — a
    # device convert compiles one program per shape through the relay)
    # and sliced on device per chunk: 1 transfer per array, not 1 per
    # array per chunk
    scg_d = jnp.asarray(padded(sc_c, SENT))
    bcs_cd = jnp.asarray(padded(bcs_c, SENT))
    bcs_vd = jnp.asarray(padded(bcs_v.astype(dtype)))
    bcw_cd = jnp.asarray(padded(bcw_c, SENT))
    bcw_vd = jnp.asarray(padded(bcw_v.astype(dtype)))
    dsc_d = jnp.asarray(np.pad(ops["dsc"], (0, n_pad - n)).astype(dtype))
    sc_vd = jnp.asarray(padded(sc_v.astype(dtype)))
    sf_cd = jnp.asarray(padded(sf_c, SENT))
    sf_vd = jnp.asarray(padded(sf_v.astype(dtype)))
    di_vd = jnp.asarray(padded(ops["di_v"].astype(dtype)))
    awc_cd = jnp.asarray(padded(awc_c, SENT))
    awc_vd = jnp.asarray(padded(awc_v.astype(dtype)))
    wsum0d = jnp.asarray(np.pad(ops["wsum0"],
                                (0, n_pad - n)).astype(dtype))

    # dispatch ALL chunks before any readback: np.asarray blocks, and a
    # blocking readback between dispatches serializes host transfer
    # with device compute (chunk s+1 idles while chunk s downloads)
    outs = []
    for s in range(0, n_pad, C):
        sl = np.s_[:, s:s + C]
        outs.append(_jit_interp(
            scg_d[sl], sc_vd[sl], sf_cd[sl], sf_vd[sl],
            di_vd[sl], awc_cd[sl], awc_vd[sl],
            wsum0d[s:s + C],
            scg_d, bcs_cd, bcs_vd, bcw_cd, bcw_vd, dsc_d,
            p_cap=p_cap, ztol=float(ZERO_TOL)))
    chunks = [(np.asarray(pc), np.asarray(pv)) for pc, pv, _, _ in outs]
    counts = [np.asarray(cnt) for _, _, cnt, _ in outs]
    mx = max(int(m) for _, _, _, m in outs)
    if mx > p_cap:
        raise InterpOverflow(f"pattern width {mx} > cap {p_cap}")

    counts = np.concatenate(counts)[:n]
    cols = np.concatenate([c for c, _ in chunks], axis=1)[:, :n]
    vals = np.concatenate([v for _, v in chunks], axis=1)[:, :n]
    return _assemble_p(n, n_coarse, states, cols, vals, counts,
                       col_to_new)
