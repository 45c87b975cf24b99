"""Pallas TPU kernels for the hot solve-phase ops.

``dia_spmv_pallas``: single-pass DIA SpMV. XLA compiles the K static-offset
shift+fma sweeps as K separate passes over HBM (measured ~5x over the
traffic bound); this kernel streams the diagonal values once, holds the
padded x window in VMEM, and accumulates all K diagonals in registers —
one HBM pass over vals, one window read, one output write.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raptor_tpu.device.formats import LANE, _round_up

_BLOCK_CANDIDATES = (65536, 32768, 16384, 8192, 4096, 2048, 1024, 512, 256,
                     128)

# Above this many (tile, slot) pairs the jlo/jhi scan-bound tables no longer
# fit SMEM (1 MB/core): the tables are passed FLATTENED to (T*W,) — a 2-D
# (T, W) SMEM operand gets its minor dim padded to 128 lanes, so a 2048-tile
# table costs 1 MB regardless of W (observed SMEM OOM at 128^3). Two int32
# tables at 1<<16 entries = 512 KB, leaving room for ws + program scalars.
# fit SMEM prefetch and the windowed kernel silently runs the full W*WR scan.
# device/par.py's format cost model must use the SAME threshold, else it can
# auto-select windowed-ELL on bounded-scan cost in the unbounded regime.
WELL_SCAN_TABLE_MAX = 1 << 16


def _pick_block(R: int, K: int, pad: int, itemsize: int) -> int:
    vmem_budget = 8 * 1024 * 1024  # leave headroom for double buffering
    for blk in _BLOCK_CANDIDATES:
        if R % blk:
            continue
        need = (K * blk + (blk + 2 * pad)) * itemsize * 2
        if need <= vmem_budget:
            return blk
    return 0


def dia_spmv_pallas(offsets: Tuple[int, ...], vals: jnp.ndarray,
                    x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """b[i] = sum_k vals[k, i] * x[i + offsets[k]]. Returns None-equivalent
    (caller falls back) when no block size fits."""
    if vals.dtype.itemsize > 4:
        return None     # Mosaic has no 64-bit support; XLA path handles f64
    K, R = vals.shape
    blk = _pick_block(R, K, pad, vals.dtype.itemsize)
    if blk < 1024:  # 1-D HBM DMA slices must align to the (1024,) tiling
        return None

    # window length must be a multiple of the 1024-element 1-D tiling
    halo2 = ((2 * pad + 1023) // 1024) * 1024
    win = blk + halo2
    x_pad = jnp.pad(x, (pad, halo2 - pad + max(0, R - x.shape[0])))

    def kernel(xpad_ref, vals_ref, out_ref, xwin, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xpad_ref.at[pl.ds(i * blk, win)], xwin, sem)
        cp.start()
        cp.wait()
        acc = vals_ref[0, :] * xwin[pl.ds(offsets[0] + pad, blk)]
        for k in range(1, K):
            acc += vals_ref[k, :] * xwin[pl.ds(offsets[k] + pad, blk)]
        out_ref[:] = acc

    # trace with x64 disabled: Mosaic has no 64-bit support, and under
    # jax_enable_x64 index helpers inside the kernel pick up int64
    with jax.enable_x64(False):
        return pl.pallas_call(
            kernel,
            grid=(R // blk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((K, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk,), lambda i: (i,),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R,), vals.dtype,
                                           vma=jax.typeof(vals).vma),
            scratch_shapes=[
                pltpu.VMEM((win,), vals.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * K * R,
                bytes_accessed=(K * R + 2 * R) * vals.dtype.itemsize,
                transcendentals=0),
        )(x_pad, vals)


def bdia_pick_block(a_pad: int, P: int, padb: int, itemsize: int) -> int:
    """Sublane block size for the BDIA kernel (A dim must divide)."""
    vmem_budget = 8 * 1024 * 1024
    for ba in (256, 128, 64, 32, 16, 8):
        if a_pad % ba:
            continue
        need = (2 * P * ba * 128 + (ba + 2 * padb) * 128) * itemsize * 2
        if need <= vmem_budget:
            return ba
    return 0


def bdia_spmv_pallas(d_offsets, idx: jnp.ndarray, vals: jnp.ndarray,
                     x: jnp.ndarray, padb: int, ba: int,
                     rows_pad: int) -> jnp.ndarray:
    """BDIA SpMV: per plane, sublane shift + lane gather (tpu.dynamic_gather,
    the VPU's native 128-wide shuffle) + fma. One streaming pass over the
    plane arrays; x window resident in VMEM per grid step.

    Returns None when no block size fits (caller falls back to the XLA
    path in formats.bdia_spmv)."""
    P, A_pad, L = idx.shape
    if vals.dtype.itemsize > 4:
        return None     # Mosaic has no 64-bit support; XLA path handles f64
    if ba == 0 or A_pad % ba or x.shape[0] % L:
        return None
    # DMA window length (ba + 2*padb sublanes) must be a multiple of the
    # 8-sublane f32 tile: a partial-tile HBM->VMEM copy faults the chip
    padb = -(-padb // 4) * 4
    C128 = x.shape[0] // L
    S_pad = max(A_pad, C128) + 2 * padb
    x2 = jnp.pad(x.reshape(C128, L),
                 ((padb, S_pad - C128 - padb), (0, 0)))
    win = ba + 2 * padb

    def kernel(xpad_ref, idx_ref, val_ref, out_ref, xwin, sem):
        i = pl.program_id(0)
        cp = pltpu.make_async_copy(
            xpad_ref.at[pl.ds(i * ba, win)], xwin, sem)
        cp.start()
        cp.wait()
        # trace with x64 disabled: under jax_enable_x64,
        # take_along_axis builds int64 iota/index helpers, and Mosaic
        # has no 64-bit support (the data here is f32/int8 regardless)
        with jax.enable_x64(False):
            acc = val_ref[0] * jnp.take_along_axis(
                xwin[pl.ds(padb + d_offsets[0], ba)],
                idx_ref[0].astype(jnp.int32), axis=1)
            for p in range(1, P):
                w = xwin[pl.ds(padb + d_offsets[p], ba)]
                acc += val_ref[p] * jnp.take_along_axis(
                    w, idx_ref[p].astype(jnp.int32), axis=1)
            out_ref[:] = acc

    with jax.enable_x64(False):
        out2 = _bdia_call(kernel, d_offsets, idx, vals, x2, P, A_pad, L,
                          ba, win)
    return out2.reshape(-1)[:rows_pad]


def _bdia_call(kernel, d_offsets, idx, vals, x2, P, A_pad, L, ba, win):
    return pl.pallas_call(
        kernel,
        grid=(A_pad // ba,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((P, ba, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, ba, L), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ba, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((A_pad, L), vals.dtype,
                                       vma=jax.typeof(vals).vma),
        scratch_shapes=[
            pltpu.VMEM((win, L), vals.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * A_pad * L,
            bytes_accessed=(2 * P * A_pad * L + 2 * A_pad * L)
            * vals.dtype.itemsize,
            transcendentals=0),
    )(x2, idx, vals)


def wind_ell_spmv_pallas(ws: jnp.ndarray, rel: jnp.ndarray,
                         vals: jnp.ndarray, x: jnp.ndarray, WR: int,
                         ba: int, rows_pad: int,
                         jlo: jnp.ndarray = None,
                         jhi: jnp.ndarray = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Windowed-ELL SpMV: the transfer-operator kernel.

    Per tile of ba*128 rows, the x window ([WR, 128] blocks starting at
    the 8-aligned ws[tile]) is DMAed into VMEM once; every ELL entry is
    then resolved by a lane gather (the VPU's native 128-wide shuffle)
    out of its window row, selected by a scan over the window rows.
    This is the TPU answer to the reference's P->mult / P->mult_T row
    loops (util/linalg/par_spmv.cpp:91-209), whose per-entry XLA-gather
    fallback was ~1000x slower.

    With ``jlo``/``jhi`` ([T, W] int32 scan bounds from
    wind_ell_arrays), slot w of tile t only scans window rows
    [jlo[t, w], jhi[t, w]) — with column-sorted CSR rows each slot
    spans a narrow band, so total work is sum-of-spans instead of
    W*WR per tile (~10x cut on the transposed 3-D prolongator, whose
    full scan is 83 slots x 632 rows). Without bounds the full W*WR
    scan runs.

    Returns None (caller falls back to formats.wind_ell_spmv) for f64 or
    empty layouts."""
    from raptor_tpu.device.formats import wind_src_height
    if vals.dtype.itemsize > 4:
        return None     # Mosaic has no 64-bit support; XLA path handles f64
    W, R = vals.shape
    TR = ba * LANE
    if W == 0 or R % TR or WR % 8:
        return None
    T = R // TR
    if jlo is not None and T * W > WELL_SCAN_TABLE_MAX:
        jlo = jhi = None    # scan-bound tables too big for SMEM prefetch
    H = wind_src_height(x.shape[0], WR)
    x2 = jnp.pad(x, (0, H * LANE - x.shape[0])).reshape(H, LANE)

    def kernel_scan(ws_ref, rel_ref, val_ref, x_ref, out_ref, win, ls,
                    sem):
        s = pl.multiple_of(ws_ref[pl.program_id(0)], 8)
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(s, WR)], win, sem)
        cp.start()
        # precompute lane ids while the DMA is in flight; the window-row
        # id stays implicit (rel >> 7 compared against the scan index)
        for w in range(W):
            ls[w] = jax.lax.bitwise_and(rel_ref[w].reshape(ba, LANE), 127)
        cp.wait()

        def jbody(j, acc):
            row = jnp.broadcast_to(win[pl.ds(j, 1)], (ba, LANE))
            for w in range(W):
                g = jnp.take_along_axis(row, ls[w], axis=1)
                q = jax.lax.shift_right_logical(
                    rel_ref[w].reshape(ba, LANE), 7)
                acc += jnp.where(q == j, g, 0.0) \
                    * val_ref[w].reshape(ba, LANE)
            return acc

        acc0 = jnp.zeros((ba, LANE), dtype=val_ref.dtype)
        out_ref[:] = jax.lax.fori_loop(0, WR, jbody, acc0).reshape(-1)

    def kernel_bounded(ws_ref, jlo_ref, jhi_ref, rel_ref, val_ref, x_ref,
                       out_ref, win, sem):
        # ONE nested (slot, window-row) loop with dynamic slot indexing:
        # unrolling W dynamic-trip-count while loops (W can be 80+ on
        # transposed 3-D prolongators) explodes the Mosaic compile
        i = pl.program_id(0)
        s = pl.multiple_of(ws_ref[i], 8)
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(s, WR)], win, sem)
        cp.start()
        cp.wait()

        def wbody(w, acc):
            relw = rel_ref[pl.ds(w, 1)].reshape(ba, LANE)
            lsw = jax.lax.bitwise_and(relw, 127)
            qw = jax.lax.shift_right_logical(relw, 7)
            vw = val_ref[pl.ds(w, 1)].reshape(ba, LANE)

            def jbody(j, acc):
                row = jnp.broadcast_to(win[pl.ds(j, 1)], (ba, LANE))
                g = jnp.take_along_axis(row, lsw, axis=1)
                return acc + jnp.where(qw == j, g, 0.0) * vw

            return jax.lax.fori_loop(jlo_ref[i * W + w],
                                     jhi_ref[i * W + w], jbody, acc)

        acc0 = jnp.zeros((ba, LANE), dtype=val_ref.dtype)
        out_ref[:] = jax.lax.fori_loop(0, W, wbody, acc0).reshape(-1)

    bounded = jlo is not None
    n_pref = 3 if bounded else 1
    operands = [jnp.asarray(ws, jnp.int32)]
    if bounded:
        # FLATTENED: 2-D SMEM operands pad the minor dim to 128 lanes
        operands += [jnp.asarray(jlo, jnp.int32).reshape(-1),
                     jnp.asarray(jhi, jnp.int32).reshape(-1)]
    scratch = [pltpu.VMEM((WR, LANE), vals.dtype)]
    if not bounded:
        scratch.append(pltpu.VMEM((W, ba, LANE), jnp.int32))
    scratch.append(pltpu.SemaphoreType.DMA)

    def _im_tile(i, *pref):
        return (0, i)

    def _im_out(i, *pref):
        return (i,)

    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_pref,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((W, TR), _im_tile, memory_space=pltpu.VMEM),
                pl.BlockSpec((W, TR), _im_tile, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((TR,), _im_out,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        out = pl.pallas_call(
            kernel_bounded if bounded else kernel_scan,
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((R,), vals.dtype,
                                           vma=jax.typeof(vals).vma),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * W * R,
                bytes_accessed=(2 * W * R + 2 * R) * vals.dtype.itemsize,
                transcendentals=0),
        )(*operands, rel, vals, x2)
    return out[:rows_pad]


def swellt_spmv_T_pallas(meta: jnp.ndarray, vals: jnp.ndarray,
                         qb: jnp.ndarray, x: jnp.ndarray, n_out: int,
                         tb: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
    """Sorted-scatter restriction: y = B^T x from the swellt layout
    (formats.swellt_arrays; reference util/linalg/par_spmv.cpp:157-209
    mult_T).

    Grid over groups of ``tb`` source tiles (128 rows each; tb a
    multiple of 8 for block tiling). Per slot of 128 target-sorted
    entries, statically unrolled:
      - the x values are one lane gather of the tile's x row (source row
        == lane position at tile size 128 — no gather tables at all),
      - the target window rows are an (AMAX, 128) one-hot select of the
        per-entry contributions,
      - the target lanes are resolved by ONE MXU matmul against the
        slot's one-hot lane matrix P[m, e] = [lout[e] == m], built from
        the lane-major lout with a sublane broadcast + iota compare and
        contracted rhs-transposed ((1,), (1,)) — Mosaic rejects dynamic
        lane slicing and has no cheap lane->sublane transpose (both
        learned on chip), and this formulation needs neither,
      - and the (AMAX, 128) product accumulates at the slot's 8-aligned
        window base (scalar-prefetched) into the VMEM-resident output.

    Returns None (caller falls back to formats.swellt_spmv_T) for f64,
    empty layouts, SMEM-oversized qb tables, or outputs too large to
    keep VMEM-resident."""
    from raptor_tpu.device.formats import SWELLT_AMAX, swellt_height
    if vals.dtype.itemsize > 4:
        return None     # Mosaic has no 64-bit support; XLA path handles f64
    T, KL = meta.shape
    Kp = KL // LANE
    if Kp == 0:
        return None
    if T * Kp * 4 > 700 * 1024:
        return None      # qb prefetch must fit SMEM (1 MB/core)
    H = swellt_height(n_out)
    if (H * LANE + 2 * tb * KL) * 4 > 12 * 1024 * 1024:
        return None
    Tp = _round_up(T, tb)
    if Tp != T:
        meta = jnp.pad(meta, ((0, Tp - T), (0, 0)))
        vals = jnp.pad(vals, ((0, Tp - T), (0, 0)))
        qb = jnp.pad(jnp.asarray(qb), (0, Tp * Kp - T * Kp))
    x2 = jnp.pad(x, (0, Tp * LANE - x.shape[0])).reshape(Tp, LANE)
    AM = SWELLT_AMAX

    def kernel(qb_ref, meta_ref, val_ref, x_ref, out_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            out_ref[:, :] = jnp.zeros((H, LANE), val_ref.dtype)

        miota = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
        jio = jax.lax.broadcasted_iota(jnp.int32, (AM, LANE), 0)
        one = val_ref.dtype.type(1)
        zero = val_ref.dtype.type(0)
        for ti in range(tb):
            xr = x_ref[ti:ti + 1, :]                        # (1, 128)
            for k in range(Kp):
                m = meta_ref[ti:ti + 1, k * LANE:(k + 1) * LANE]
                srcl = jax.lax.bitwise_and(m, 127)
                qrel = jax.lax.bitwise_and(
                    jax.lax.shift_right_logical(m, 7), AM - 1)
                lout = jax.lax.shift_right_logical(m, 12)   # (1, 128)
                v = val_ref[ti:ti + 1, k * LANE:(k + 1) * LANE]
                xv = jnp.take_along_axis(xr, srcl, axis=1)  # (1, 128)
                c = v * xv
                A = jnp.where(qrel == jio,
                              jnp.broadcast_to(c, (AM, LANE)), zero)
                Pm = jnp.where(lout == miota, one, zero)    # (128m, 128e)
                y = jax.lax.dot_general(
                    A, Pm, (((1,), (1,)), ((), ())),
                    # HIGHEST: the MXU's default bf16 passes truncate
                    # the f32 values (~1e-3 rel error, observed on chip)
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=val_ref.dtype)   # (AM, 128m)
                t0 = pl.multiple_of(
                    qb_ref[(g * tb + ti) * Kp + k], 8)
                out_ref[pl.ds(t0, AM), :] += y

    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Tp // tb,),
            in_specs=[
                pl.BlockSpec((tb, KL), lambda g, qb: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, KL), lambda g, qb: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tb, LANE), lambda g, qb: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((H, LANE), lambda g, qb: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((H, LANE), vals.dtype,
                                           vma=jax.typeof(vals).vma),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * T * KL * AM,
                bytes_accessed=2 * T * KL * 4 + T * LANE * 4,
                transcendentals=0),
        )(jnp.asarray(qb, jnp.int32), meta, vals, x2)
    return out.reshape(-1)[:n_out]


def bell_spmv_pallas(src: jnp.ndarray, idx: jnp.ndarray,
                     vals: jnp.ndarray, x: jnp.ndarray,
                     rows_pad: int, interpret: bool = False) -> jnp.ndarray:
    """BELL SpMV: slot-compacted plane blocks for unstructured coarse
    operators (see formats.bell_arrays for the layout).

    The whole x vector stays VMEM-resident as [C128, 128] (BELL is
    selected for coarse Galerkin operators, where x is a few hundred KB);
    the slot arrays stream through VMEM in chunks of ``ba`` target
    blocks. Per slot layer w and target block t the kernel copies source
    row ``src[w, t]`` out of the resident x2 (a dynamic single-sublane
    VMEM read — cheap, and NOT an HBM DMA, so no 8-sublane tile
    constraint), assembles the [ba, 128] slot window in scratch, and
    resolves the per-row entries with one lane gather + fma.

    This replaces the XLA row-block-gather formulation of
    formats.bell_spmv, which costs 300+ ms on this chip (XLA materializes
    the gather as per-row dynamic-slices over HBM). Reference analog:
    CSR SpMV over coarse ParCSR levels (util/linalg/par_spmv.cpp:28-89).

    Returns None (caller falls back) for f64, empty layouts, or when x
    does not fit the VMEM budget."""
    if vals.dtype.itemsize > 4:
        return None     # Mosaic has no 64-bit support; XLA path handles f64
    W, A128 = src.shape
    if W == 0:
        return None
    ba = 8
    C128 = -(-x.shape[0] // LANE)
    C128p = -(-C128 // 8) * 8
    # resident x is hard-capped at 4 MB: an 8.4 MB fine-level x
    # RESOURCE_EXHAUSTs on chip (128^3 P^T probe) even though the naive
    # VMEM sum fits — the pipeline's double buffering multiplies it
    if C128p * LANE * 4 > 4 * 1024 * 1024:
        return None
    if C128p * LANE * 4 + 4 * W * ba * LANE * (4 + 1 + 4) > 100 * 1024 * 1024:
        return None
    A128p = -(-A128 // ba) * ba
    x2 = jnp.pad(x, (0, C128p * LANE - x.shape[0])).reshape(C128p, LANE)
    if A128p != A128:
        src = jnp.pad(src, ((0, 0), (0, A128p - A128)))
        idx = jnp.pad(idx, ((0, 0), (0, A128p - A128), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, A128p - A128), (0, 0)))
    # src rides along as a per-block SMEM operand, NOT scalar prefetch:
    # a (W, A128) prefetch table pads its minor dim to 128 lanes in SMEM
    # (1.5-2.5 MB at 128^3 vs the 1 MB budget) — the production-width
    # Mosaic rejection of round 4. Blocked (ba, W) it is ~16 KB/step.
    srcT = jnp.asarray(src, jnp.int32).T  # (A128p, W)

    def kernel(src_ref, idx_ref, val_ref, x_ref, out_ref, wrow_s):
        def wbody(w, acc):
            for t in range(ba):
                sb = src_ref[t, w]
                wrow_s[pl.ds(t, 1)] = x_ref[pl.ds(sb, 1)]
            lid = idx_ref[w].astype(jnp.int32)
            return acc + val_ref[w] * jnp.take_along_axis(
                wrow_s[:], lid, axis=1)

        acc0 = jnp.zeros((ba, LANE), dtype=val_ref.dtype)
        out_ref[:] = jax.lax.fori_loop(0, W, wbody, acc0)

    with jax.enable_x64(False):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(A128p // ba,),
            in_specs=[
                pl.BlockSpec((ba, W), lambda i: (i, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((W, ba, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, ba, LANE), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C128p, LANE), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ba, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((ba, LANE), vals.dtype),
            ],
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            interpret=interpret,
            out_shape=jax.ShapeDtypeStruct((A128p, LANE), vals.dtype,
                                           vma=jax.typeof(vals).vma),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * W * A128p * LANE,
                bytes_accessed=(2 * W * A128p * LANE + 2 * A128p * LANE)
                * vals.dtype.itemsize,
                transcendentals=0),
        )(srcT, idx, vals, x2)
    return out.reshape(-1)[:rows_pad]


def use_pallas() -> bool:
    import os
    if os.environ.get("RAPTOR_TPU_PALLAS", "1") == "0":
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False
