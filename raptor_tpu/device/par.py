"""Sharded device matrix + halo-exchange SpMV under ``shard_map``.

The solve-phase equivalent of the reference's ``ParCSRMatrix::mult`` /
``mult_T`` / ``residual`` (util/linalg/par_spmv.cpp:25-280): each mesh shard
owns a padded row block split into an on_proc ELL block (local columns) and an
off_proc ELL block (condensed halo columns). One SpMV is

    send = x[send_idx]                 # gather of boundary values
    recv = lax.all_to_all(send)        # single fused ICI collective
    halo = recv[halo_src]              # scatter into off_proc column order
    b    = on_ell @ x  +  off_ell @ halo

with XLA's latency-hiding scheduler overlapping the collective against the
on_proc product (the reference overlaps MPI_Isend/Irecv the same way,
par_spmv.cpp:25-59).

All shapes are static and identical across shards (SPMD): rows padded to the
max local rows, halos padded to the max halo size, per-pair messages padded to
the max pair count. Padded matrix entries are (col 0, val 0) so padding never
needs masking inside the linear ops.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from raptor_tpu.comm.plan import (CommPlan, build_comm_plan,
                                  build_comm_plan_spmd)
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.device.formats import (
    bdia_arrays, bdia_plane_counts, bdia_split_rest, bdia_spmv,
    bell_arrays, bell_spmv, bell_stats,
    dia_arrays, dia_detect, dia_spmv, dia_spmv_T, ell_arrays,
    ell_boundary_arrays, ell_spmv, ell_spmv_T, off_spmv, off_spmv_T,
    select_planes, swellt_arrays, swellt_height, swellt_spmv,
    swellt_spmv_T, swellt_stats, SWELLT_AMAX,
    wind_ell_arrays, wind_ell_cols, wind_ell_spmv, wind_ell_stats,
    wind_src_height)

ROW_AXIS = "rows"

# Communication axes used by the shard-level collectives. Read at TRACE time
# (inside shard_map bodies); wrappers tracing over non-default meshes (e.g.
# the 2-D (host, local) TAP mesh) activate use_comm_axes around the first
# call of their jitted function.
_COMM_AXES = ROW_AXIS


def comm_axes():
    return _COMM_AXES


import contextlib


@contextlib.contextmanager
def use_comm_axes(axes):
    global _COMM_AXES
    old = _COMM_AXES
    _COMM_AXES = axes
    try:
        yield
    finally:
        _COMM_AXES = old


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _np_as(x: np.ndarray, npdt) -> np.ndarray:
    """NumPy dtype view/convert without copying when already right."""
    return np.asarray(x, dtype=npdt)


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (ROW_AXIS,))


def make_mesh2(n_hosts: int, n_local: int) -> Mesh:
    """2-D (host, local) mesh for topology-aware comm (TAPComm equivalent:
    ICI within 'local', DCN across 'host')."""
    devs = jax.devices()
    n = n_hosts * n_local
    return Mesh(np.array(devs[:n]).reshape(n_hosts, n_local),
                ("host", "local"))


def _leading_axes(mesh: Mesh):
    names = tuple(mesh.axis_names)
    return names[0] if len(names) == 1 else names


def _shard_leading(x: np.ndarray, mesh: Mesh, dtype=None) -> jnp.ndarray:
    """Place a [S, ...] stacked host array with the leading axis sharded
    over all mesh axes (flattened shard order).

    The dtype conversion happens in NumPy: converting on device would
    compile one convert_element_type program per distinct shape, which is
    seconds per program through a remote-compile relay."""
    x = np.asarray(x)
    target = jax.dtypes.canonicalize_dtype(dtype if dtype is not None
                                           else x.dtype)
    arr = np.asarray(x, dtype=target)
    spec = P(_leading_axes(mesh), *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, jax.sharding.NamedSharding(mesh, spec))


_DATA_FIELDS = ["on_cols", "on_vals", "off_rows", "off_cols", "off_vals",
                "dia_vals", "bd_idx", "bd_vals",
                "bl_src", "bl_idx", "bl_vals",
                "rest_rows", "rest_cols", "rest_vals", "emb_idx",
                "emb_mask", "wl_ws", "wl_jlo", "wl_jhi",
                "send_idx", "send_mask", "halo_src",
                "slot_to_halo", "recv_mask", "row_mask", "col_mask"]
_META_FIELDS = ["rows_pad", "cols_pad", "halo_pad", "slot", "dia_pad",
                "dia_offsets", "bd_offsets", "bd_padb", "bd_ba",
                "wl_wr", "wl_ba",
                "on_format", "embed_kind", "on_rows_pad", "has_t",
                "global_num_rows", "global_num_cols"]


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=_DATA_FIELDS, meta_fields=_META_FIELDS,
)
@dataclasses.dataclass
class DeviceParCSR:
    """Stacked-over-shards device matrix (leading axis = shard).

    The on_proc block is stored either as transposed-ELL (general sparsity)
    or as DIA diagonals (``on_format == "dia"``, chosen at setup when the
    block has few distinct col-row offsets — the common case for stencil
    operators and their Galerkin products on structured grids). DIA SpMV is
    gather-free: K shift+fma sweeps at HBM bandwidth."""

    on_cols: jnp.ndarray    # [S, W_on, R] int32 (dummy [S,1,R] when DIA)
    on_vals: jnp.ndarray    # [S, W_on, R]
    # off_proc block, boundary-compacted: only the B rows with off entries
    off_rows: jnp.ndarray   # [S, B] int32 local row ids (pad = rows_pad)
    off_cols: jnp.ndarray   # [S, W_off, B] int32 (halo col ids)
    off_vals: jnp.ndarray   # [S, W_off, B]
    dia_vals: jnp.ndarray   # [S, K, R] diagonal values (dummy when ELL)
    # BDIA planes (on_format == "bdia"): block-offset quantized diagonals
    # with per-entry lane ids — sublane shift + lane gather SpMV
    bd_idx: jnp.ndarray     # [S, P, A_pad, 128] int8 lane ids
    bd_vals: jnp.ndarray    # [S, P, A_pad, 128]
    # BELL (on_format == "bell"): slot-compacted plane blocks — per
    # target 128-block, W_b (source block, lanes, vals) slots; SpMV is
    # row-block gather + lane gather + fma, streaming only OCCUPIED
    # blocks (unstructured coarse Galerkin operators where full BDIA
    # planes are mostly zeros and ELL would gather per entry)
    bl_src: jnp.ndarray     # [S, W_b, A_pad] int32 source block ids
    bl_idx: jnp.ndarray     # [S, W_b, A_pad, 128] int8 lane ids
    bl_vals: jnp.ndarray    # [S, W_b, A_pad, 128]
    # bdia 'rest': entries of dropped (near-empty) planes, compacted to
    # the rows that have them — per-entry gather over local x
    rest_rows: jnp.ndarray  # [S, Br] int32 (pad = rows_pad)
    rest_cols: jnp.ndarray  # [S, Wr, Br] int32 local col ids
    rest_vals: jnp.ndarray  # [S, Wr, Br]
    # embedding plan (transfer operators): coarse 128-blocks anchored at
    # fine-aligned 128-blocks (lanes preserved) so the on block formats
    # as DIA/BDIA and the embedding is a row-block gather
    emb_idx: jnp.ndarray    # [S, fmt_R/128] (cols: inverse block map) /
                            # [S, R/128] (rows: forward block map) int32
    emb_mask: jnp.ndarray   # [S, fmt_R/128] 1.0 on anchored blocks (cols)
    # windowed ELL (on_format == "well"): on_cols holds WINDOW-RELATIVE
    # cols; per tile of wl_ba*128 rows, x is read only inside the window
    # of wl_wr 128-blocks starting at wl_ws[tile] — the Pallas kernel
    # streams the window through VMEM and resolves entries with lane
    # gathers (transfer operators whose spans defeat DIA/BDIA, e.g.
    # 3-D extended+i P / P^T)
    wl_ws: jnp.ndarray      # well: [S, T] int32 8-aligned window starts
    #                         wellt: [S, T*Kp] int32 per-slot window base
    wl_jlo: jnp.ndarray     # well: [S, T, W] int32 per-(tile, slot)
    #                         scan lo (wellt: unused [S, 1, 1])
    wl_jhi: jnp.ndarray     # well: [S, T, W] int32 per-(tile, slot)
    #                         scan hi (wellt: unused [S, 1, 1])
    send_idx: jnp.ndarray   # [S, S, Q] int32 (local col ids)
    send_mask: jnp.ndarray  # [S, S, Q]
    halo_src: jnp.ndarray   # [S, H] int32 (flat recv slot)
    slot_to_halo: jnp.ndarray  # [S, S, Q] int32
    recv_mask: jnp.ndarray  # [S, S, Q]
    row_mask: jnp.ndarray   # [S, R] 1.0 on valid rows
    col_mask: jnp.ndarray   # [S, C] 1.0 on valid local cols
    rows_pad: int
    cols_pad: int
    halo_pad: int
    slot: int
    dia_pad: int            # max |offset| when DIA
    dia_offsets: tuple      # static union of diagonal offsets (K,)
    bd_offsets: tuple       # static plane block-offsets (P,)
    bd_padb: int            # max |block offset|
    bd_ba: int              # pallas sublane block size (0 = XLA fallback)
    wl_wr: int              # windowed-ELL window height (128-blocks)
    wl_ba: int              # windowed-ELL tile size (128-row blocks)
    on_format: str          # "ell"|"dia"|"bdia"|"bell"|"well"|"wellt"
    embed_kind: str         # "none" | "cols" | "rows"
    on_rows_pad: int        # row space of the PACKED on block
    has_t: bool             # transpose path available (ELL copy packed)
    global_num_rows: int
    global_num_cols: int

    @property
    def n_shards(self) -> int:
        return self.on_cols.shape[0]


MAX_DIA_OFFSETS = 64
MAX_BDIA_PLANES = 1024
WELL_MAX_WR = 1024      # windowed-ELL window cap (512 KB f32 VMEM)
# Transfer-format cost model, CALIBRATED ON SILICON (round-5 128^3/48^3
# shoot-outs, v5e). Every kernel is issue-bound, with a steady cost per
# inner scan step plus a fixed cost per (tile, slot) pair (loop set-up,
# operand slicing) that dominates short-band shapes:
#   well  : 25 ns/step + 400 ns/pair.  Fit: 128^3 P (scan 186504,
#           pairs 22528) -> 13.7 ms model vs 14.1 measured; 128^3 Pt
#           (scan 1801707, pairs 13861) -> 50.6 model vs 45.6 measured
#   wellt : ~520 ns per 128-entry sorted-scatter slot (one lane gather
#           + one-hot MXU + 32-row accumulate; 128^3 Pt: 16384 tiles x
#           8 slots -> 8.5 ms measured on chip)
#   bell  : 100 ns per (slot-layer, 8-target-block) step: 8 sublane
#           copies + lane gather + fma (128^3 P: Wb=24 x 2048 steps ->
#           4.85 ms; 48^3 P: 2376 steps -> 0.245 ms)
WELL_NS_PER_STEP = 25.0
WELL_NS_PER_SLOT = 400.0
SWELLT_NS_PER_SLOT = 520.0
BELL_NS_PER_STEP = 100.0
# The bell Pallas kernel keeps x VMEM-resident: candidacy requires the
# column vector to fit (8.4 MB fine-level x RESOURCE_EXHAUSTs on chip;
# 683 KB coarse x runs). 4 MB leaves headroom for double buffering.
BELL_X_VMEM_CAP = 4 * 1024 * 1024


def _block_anchors(firsts: np.ndarray, space: int) -> np.ndarray:
    """Block-aligned anchor assignment: coarse 128-block k maps whole to a
    distinct fine 128-block bm(k) near its consumers, lanes preserved
    (anchor(c) = bm(c//128)*128 + c%128). Keeps the embedded operator
    quasi-banded like exact anchors do, but makes the embedding itself a
    row-block gather — ~50x cheaper than an element scatter on TPU."""
    n = len(firsts)
    K = -(-n // 128)
    SB = space // 128
    assert K <= SB, (K, SB)
    want = np.array([int(firsts[128 * k:128 * (k + 1)].min()) // 128
                     for k in range(K)], dtype=np.int64)
    bm = np.empty(K, dtype=np.int64)
    prev = -1
    for k in range(K):
        prev = max(prev + 1, int(want[k]))
        bm[k] = prev
    # fix tail overflow: strictly increasing and within SB
    for k in range(K - 1, -1, -1):
        cap = SB - (K - k)
        if bm[k] > cap:
            bm[k] = cap
        else:
            break
    anchor = bm[np.arange(n) // 128] * 128 + np.arange(n) % 128
    return anchor, bm


def _pick_anchors(firsts: np.ndarray, space: int) -> np.ndarray:
    """Assign each of n items a distinct slot in [0, space), preferring
    its 'first' position (vectorized; collisions resolved by forward
    scan). Used to embed coarse indices at fine-aligned positions."""
    n = len(firsts)
    anchor = np.full(n, space, dtype=np.int64)
    taken = np.zeros(space + 1, dtype=bool)
    order = np.argsort(firsts, kind="stable")
    # first pass: claim preferred slots (in position order => determinism)
    pref = firsts[order]
    free = ~taken[pref]
    # detect duplicates among preferred slots: keep only first claimant
    uniq_first = np.concatenate(([True], pref[1:] != pref[:-1]))
    ok = free & uniq_first
    anchor[order[ok]] = pref[ok]
    taken[pref[ok]] = True
    # collision pass: linear scan forward (rare)
    for i in order[~ok]:
        s = int(firsts[i])
        while s < space and taken[s]:
            s += 1
        if s >= space:  # scan backward as last resort
            s = int(firsts[i]) - 1
            while s >= 0 and taken[s]:
                s -= 1
            assert s >= 0, "embedding space exhausted"
        anchor[i] = s
        taken[s] = True
    return anchor


def _remap_cols(blk, anchor: np.ndarray, space: int):
    """On_proc block with columns moved to their anchor slots."""
    from raptor_tpu.core.matrix import CSRMatrix
    out = CSRMatrix(blk.n_rows, space, blk.indptr.copy(),
                    anchor[blk.indices].astype(np.int64), blk.data.copy())
    return out.sort()


def _remap_rows(blk, anchor: np.ndarray, space: int):
    """On_proc block with rows moved to their anchor slots."""
    from raptor_tpu.core.matrix import CSRMatrix
    row_nnz = np.diff(blk.indptr)
    counts = np.zeros(space, dtype=np.int64)
    counts[anchor[:blk.n_rows]] = row_nnz
    indptr = np.concatenate(([0], np.cumsum(counts)))
    indices = np.zeros(blk.nnz, dtype=np.int64)
    data = np.zeros(blk.nnz, dtype=np.float64)
    if blk.nnz:
        erows = np.repeat(np.arange(blk.n_rows), row_nnz)
        pos = np.arange(blk.nnz) - np.repeat(blk.indptr[:-1], row_nnz)
        dest = indptr[anchor[erows]] + pos
        indices[dest] = blk.indices
        data[dest] = blk.data
    return CSRMatrix(space, blk.n_cols, indptr, indices, data)


def _gall(tr, obj):
    """Gathered list of ``obj`` over all ranks (``[obj]`` in-process).
    The caller runs the same deterministic reduction on the list on
    every rank — the SPMD stat-agreement seam."""
    return [obj] if tr is None else tr.allgather_obj(obj)


def device_put_matrix(a: ParCSRMatrix, mesh: Mesh,
                      dtype=jnp.float64, lane_pad: int = 1,
                      force_format: Optional[str] = None,
                      embed: Optional[str] = None,
                      need_transpose: bool = True,
                      tr=None) -> DeviceParCSR:
    """Build the device plan from a host ParCSRMatrix and shard it.

    The on_proc block format is chosen per matrix: DIA when every shard's
    block has <= MAX_DIA_OFFSETS distinct diagonals (stencil-structured);
    else BDIA when the 128-quantized block-offset planes fit the budget
    (quasi-banded, e.g. coarse Galerkin operators); else transposed-ELL
    (BDIA keeps the ELL arrays too, for the transpose path).

    ``tr`` (a ``comm.Transport``): SPMD mode — ``a`` is a local view,
    this process packs ONLY its shards, format/padding statistics are
    agreed through transport allgathers, the halo plan comes from the
    rank-local handshake, and placement uses
    ``jax.make_array_from_single_device_arrays`` against the global
    mesh (each controller uploads its addressable devices only). The
    in-process path is the tr=None degenerate case of the same code."""
    part = a.partition
    S = part.n_shards
    assert S == mesh.devices.size, (S, mesh.devices.size)
    shards = a.shards()
    SL = len(shards)
    plan: CommPlan = (build_comm_plan(a, lane_pad=lane_pad) if tr is None
                      else build_comm_plan_spmd(a, tr, lane_pad=lane_pad))
    # staging arrays are built directly in the device dtype: a float64
    # staging copy + conversion pass would double host packing traffic
    npdt = np.dtype(jax.dtypes.canonicalize_dtype(dtype))

    R = _round_up(max(1, part.max_local_rows), lane_pad)
    C = _round_up(max(1, part.max_local_cols), lane_pad)
    W_off = max(_gall(tr, max(
        (int(np.diff(s.off_proc.indptr).max())
         if s.off_proc.nnz else 0) for s in shards)))
    # boundary row count (rows with >= 1 off_proc entry), uniform pad
    B = max(_gall(tr, max(
        int(np.count_nonzero(np.diff(s.off_proc.indptr)))
        for s in shards)))
    B = _round_up(B, lane_pad) if B else 0

    # optional embedding: move a transfer operator's short axis (coarse
    # cols of P / coarse rows of P^T) to fine-aligned anchor slots so the
    # block becomes near-banded and formats as DIA/BDIA. Forward SpMV
    # then costs one small scatter (cols) or gather (rows) plus
    # streaming planes, instead of a full-length gather.
    embed_kind = "none"
    emb_idx = np.zeros((SL, 1), dtype=np.int32)
    emb_mask = np.zeros((SL, 1), dtype=np.float64)
    fmt_blocks = [blk.on_proc for blk in shards]
    fmt_R = R
    # embed feasibility from the (replicated) partition, so every rank
    # decides identically without communication
    max_on_cols = int(part.max_local_cols)
    max_on_rows = int(part.max_local_rows)
    if (embed == "cols" and R % 128 == 0 and C % 128 == 0
            and -(-max_on_cols // 128) <= R // 128):
        # inverse block map: fine 128-block j <- coarse block inv[j]
        embed_kind, fmt_R = "cols", R
        emb_idx = np.zeros((SL, R // 128), dtype=np.int32)
        emb_mask = np.zeros((SL, R // 128), dtype=np.float64)
        new_blocks = []
        for s, blk in enumerate(shards):
            m = blk.on_proc.to_scipy().tocsc()
            nc = blk.on_proc.n_cols
            firsts = np.zeros(nc, dtype=np.int64)
            ne = np.diff(m.indptr) > 0
            firsts[ne] = m.indices[m.indptr[:-1][ne]]
            firsts[~ne] = (np.nonzero(~ne)[0] * max(1, R // max(1, nc)))
            anchor, bm = _block_anchors(firsts, R)
            emb_idx[s, bm] = np.arange(len(bm))
            emb_mask[s, bm] = 1.0
            new_blocks.append(_remap_cols(blk.on_proc, anchor, R))
        fmt_blocks = new_blocks
    elif (embed == "rows" and R % 128 == 0 and C % 128 == 0
            and -(-max_on_rows // 128) <= C // 128):
        # forward block map: coarse block k -> fine block bm[k]
        embed_kind, fmt_R = "rows", C
        emb_idx = np.zeros((SL, R // 128), dtype=np.int32)
        new_blocks = []
        for s, blk in enumerate(shards):
            bo = blk.on_proc
            nr = bo.n_rows
            firsts = np.zeros(nr, dtype=np.int64)
            ne = np.diff(bo.indptr) > 0
            firsts[ne] = bo.indices[bo.indptr[:-1][ne]]
            firsts[~ne] = (np.nonzero(~ne)[0] * max(1, C // max(1, nr)))
            anchor, bm = _block_anchors(firsts, C)
            emb_idx[s, :len(bm)] = bm
            new_blocks.append(_remap_rows(bo, anchor, C))
        fmt_blocks = new_blocks

    # decide on_proc format: DIA when the union of all shards' diagonal
    # offset sets is small (static across shards for SPMD uniformity);
    # the per-shard stats are allgathered in SPMD mode so every rank
    # reaches the same decision
    shard_offs_l = [dia_detect(blk, MAX_DIA_OFFSETS) for blk in fmt_blocks]
    shard_offs = [o for part_l in _gall(tr, shard_offs_l) for o in part_l]
    union = (np.unique(np.concatenate([o for o in shard_offs]))
             if all(o is not None for o in shard_offs) else None)
    A128 = -(-fmt_R // 128)
    use_dia = force_format
    bd_spec = []
    if use_dia is None:
        if union is not None and len(union) <= MAX_DIA_OFFSETS:
            use_dia = "dia"
        else:
            # merge per-shard plane counts, keep the planes dense enough
            # that a streaming pass beats per-entry gather; the leftover
            # entries run through the compacted-gather 'rest' path
            merged_l = {}
            for blk in fmt_blocks:
                planes, counts = bdia_plane_counts(blk)
                for p, c in zip(planes, counts):
                    merged_l[p] = merged_l.get(p, 0) + int(c)
            merged = {}
            for md in _gall(tr, merged_l):
                for p, c in md.items():
                    merged[p] = merged.get(p, 0) + int(c)
            itemsz = jnp.dtype(dtype).itemsize
            mem_cap = int(os.environ.get("RAPTOR_TPU_BDIA_MEM",
                                         str(3 << 30)))
            per_plane = max(1, A128 * 128 * (itemsz + 1))
            max_planes = min(MAX_BDIA_PLANES, max(8, mem_cap // per_plane))
            bd_spec = select_planes(merged, max_planes, A128)
            # worth it only when the planes carry most entries (else the
            # per-entry 'rest' gather dominates anyway) and the block
            # window stays modest
            total = sum(merged.values())
            kept_nnz = sum(merged[p] for p in bd_spec)
            pad_ok = (max((abs(d) for d, _ in bd_spec), default=0) <= 256)
            use_dia = ("bdia" if bd_spec and pad_ok
                       and kept_nnz >= 0.6 * total else "ell")
            # BELL beats both when the selected planes would stream
            # mostly zeros (low fill) or when too much falls to the
            # per-entry paths: compare streamed-slot estimates
            # (REST_PEN ~ measured per-entry gather penalty vs streaming)
            stats = [st for p_l in _gall(
                tr, [bell_stats(blk) for blk in fmt_blocks])
                for st in p_l]
            Wb = max((w for w, _ in stats), default=0)
            # This slot-estimate heuristic is the CPU (XLA-path) opt-in
            # only. On TPU, bell competes in the calibrated-ns candidate
            # comparison below (round 5: the round-4 production-width
            # Mosaic rejection was an SMEM padding OOM of the (W, A128)
            # prefetch table; with src as a blocked SMEM operand the
            # kernel runs 128^3 P at 4.85 ms vs well's 14.1).
            bell_on = (os.environ.get("RAPTOR_TPU_BELL", "0") == "1"
                       and jax.devices()[0].platform != "tpu")
            if bell_on and Wb > 0 and A128 > 2:
                # measured per-entry gather cost is orders of magnitude
                # above a streamed slot; 128 is a conservative penalty
                REST_PEN = 128
                bell_slots = Wb * A128 * 128
                if use_dia == "bdia":
                    bdia_slots = (len(bd_spec) * A128 * 128
                                  + REST_PEN * (total - kept_nnz))
                    # near-ties stay BDIA (it has the Pallas kernel)
                    if bell_slots < 0.8 * bdia_slots:
                        use_dia = "bell"
                else:
                    if bell_slots < REST_PEN * total:
                        use_dia = "bell"
    if use_dia == "bell":
        if force_format == "bell":
            bl_Wb = max(_gall(tr, max(
                (bell_stats(blk)[0] for blk in fmt_blocks), default=0)))
        else:
            bl_Wb = Wb  # stats computed over fmt_blocks (embedding kept)
    if use_dia == "ell":
        # embedding only pays off through DIA/BDIA/BELL
        embed_kind, fmt_R = "none", R
        fmt_blocks = [blk.on_proc for blk in shards]
        emb_idx = np.zeros((SL, 1), dtype=np.int32)
        emb_mask = np.zeros((SL, 1), dtype=np.float64)

    # Transfer-format rescue: matrices headed for per-entry ELL gathers —
    # or for a sparse-filled BDIA plane set — compete well vs wellt vs
    # bell on the silicon-calibrated per-step ns model (constants above).
    # Stats unified across shards for SPMD uniformity.
    wl_ba, wl_wr, wl_T = 8, 0, 1
    wW = wWt = 0
    if force_format in ("well", "wellt") or (
            use_dia in ("ell", "bdia")
            and os.environ.get("RAPTOR_TPU_WELL", "1") == "1"):
        from raptor_tpu.device.pallas_kernels import WELL_SCAN_TABLE_MAX
        itemsz = jnp.dtype(dtype).itemsize
        stats = [st for p_l in _gall(
            tr, [wind_ell_stats(blk.on_proc, R, wl_ba) for blk in shards])
            for st in p_l]
        wW = max(w for w, _, _, _ in stats)
        wWR = max(wr for _, wr, _, _ in stats)
        w_scan = max(sc for _, _, _, sc in stats)
        R_w = _round_up(R, wl_ba * 128)
        T_w = R_w // (wl_ba * 128)
        # past the kernel's SMEM table limit the bounded scan is
        # silently dropped — cost the full W*WR scan it actually runs
        if T_w * wW > WELL_SCAN_TABLE_MAX:
            w_scan = T_w * wW * wWR
        cost_well = (WELL_NS_PER_STEP * w_scan
                     + WELL_NS_PER_SLOT * T_w * wW)
        # TRANSPOSE-windowed candidacy (restriction-shaped blocks only:
        # strictly fewer rows than cols, e.g. P^T). The sorted-scatter
        # layout (formats.swellt_arrays) packs the FORWARD matrix of the
        # transposed block with entries target-sorted into 128-wide
        # slots; the kernel keeps the whole padded output VMEM-resident,
        # so it needs a small row space.
        wellt_cand = (force_format == "wellt"
                      or (force_format is None
                          and part.global_num_rows < part.global_num_cols))
        sw_T = sw_Kp = 0
        if wellt_cand:
            statsT = [st for p_l in _gall(
                tr, [swellt_stats(blk.on_proc.transpose())
                     for blk in shards])
                for st in p_l]
            sw_T = max(t for t, _ in statsT)
            sw_Kp = max(k for _, k in statsT)
            cost_wellt = SWELLT_NS_PER_SLOT * sw_T * sw_Kp
            H_t = swellt_height(R)
            wellt_fits = ((H_t * 128 + 8 * sw_Kp * 128) * itemsz
                          <= 12 * 1024 * 1024
                          and sw_T * sw_Kp * 4 <= 700 * 1024)
        cand = []
        if wW > 0 and wWR <= WELL_MAX_WR and R >= 2048:
            cand.append((cost_well, "well"))
        if wellt_cand and sw_Kp > 0 and C >= 2048 and wellt_fits:
            cand.append((cost_wellt, "wellt"))
        # bell (Pallas path only): forward-shaped blocks whose column
        # vector stays VMEM-resident — the production 3-D prolongator
        # format (128^3 P: 4.85 ms vs well 14.1). Restriction-shaped
        # blocks are excluded: the fine-side x exhausts VMEM on chip
        # and the per-(slot, step) cost is ~12x worse (48^3 Pt 9.1 ms).
        bell_Wr = 0
        if (use_dia == "ell" and force_format is None and itemsz <= 4
                and part.global_num_rows > part.global_num_cols
                and _round_up(C, 1024) * itemsz <= BELL_X_VMEM_CAP):
            from raptor_tpu.device.pallas_kernels import use_pallas
            if use_pallas():
                bstats = [st for p_l in _gall(
                    tr, [bell_stats(blk) for blk in fmt_blocks])
                    for st in p_l]
                bell_Wr = max((w for w, _ in bstats), default=0)
                A128_r = -(-fmt_R // 128)
                if bell_Wr > 0 and A128_r > 2:
                    cost_bell = (BELL_NS_PER_STEP * bell_Wr
                                 * _round_up(A128_r, 8) // 8)
                    cand.append((cost_bell, "bell"))
        pick = force_format if force_format in ("well", "wellt") else None
        if force_format is None and cand:
            cbest, fbest = min(cand)
            if use_dia == "ell":
                pick = fbest
            elif use_dia == "bdia":
                # the "replace BDIA at all?" gate stays in the proven
                # legacy element-op units (round-2 calibration) — the ns
                # model only ranks the rescue family against itself
                rest_nnz = total - kept_nnz
                legacy = {"well": 3 * w_scan * wl_ba * 128,
                          # ns -> legacy element-ops at the well scan-
                          # regime rate (25 ns per 3*1024-element step)
                          "wellt": cost_wellt * (3 * wl_ba * 128
                                                 / WELL_NS_PER_STEP)
                          if wellt_cand and sw_Kp > 0 else None}
                legacy_best = min(legacy[f] for _, f in cand
                                  if legacy.get(f) is not None)
                legacy_bdia = 3 * len(bd_spec) * A128 * 128 \
                    + 128 * rest_nnz
                # bias toward BDIA near ties (its kernel is the more
                # mature one)
                if legacy_best < 0.7 * legacy_bdia:
                    pick = fbest
        if pick == "well" and wW > 0:
            use_dia, wl_wr = "well", max(wWR, 8)
            wl_T = T_w
        elif pick == "wellt":
            use_dia, wl_wr = "wellt", SWELLT_AMAX
            wl_T = sw_T
        elif pick == "bell":
            use_dia, bl_Wb = "bell", bell_Wr
            A128 = -(-fmt_R // 128)
        if use_dia in ("well", "wellt"):
            # well/wellt pack the ORIGINAL blocks; drop any embedding
            embed_kind = "none"
            emb_idx = np.zeros((SL, 1), dtype=np.int32)
            emb_mask = np.zeros((SL, 1), dtype=np.float64)

    if use_dia == "bell":
        bl_src = np.zeros((SL, bl_Wb, A128), dtype=np.int32)
        bl_idx = np.zeros((SL, bl_Wb, A128, 128), dtype=np.int8)
        bl_vals = np.zeros((SL, bl_Wb, A128, 128), dtype=npdt)
    else:
        bl_src = np.zeros((SL, 0, 1), dtype=np.int32)
        bl_idx = np.zeros((SL, 0, 1, 128), dtype=np.int8)
        bl_vals = np.zeros((SL, 0, 1, 128), dtype=npdt)

    bd_offsets, bd_padb, bd_ba = (), 1, 0
    rest_shards = fmt_blocks
    if use_dia == "bdia":
        bd_offsets = tuple(d for d, _ in bd_spec)
        bd_padb = max(1, max(abs(d) for d in bd_offsets))
        Pn = len(bd_spec)
        itemsize = jnp.dtype(dtype).itemsize
        bd_ba = 0
        for cand in (256, 128, 64, 32, 16, 8):
            # vals (itemsize) + int8 lane ids (1 B) per plane slot
            need = (Pn * cand * 128 * (itemsize + 1)
                    + (cand + 2 * bd_padb) * 128 * itemsize) * 2
            if need <= 32 * 1024 * 1024:
                bd_ba = cand
                break
        A_pad = _round_up(A128, bd_ba) if bd_ba else A128
        bd_idx = np.zeros((SL, Pn, A_pad, 128), dtype=np.int8)
        bd_vals = np.zeros((SL, Pn, A_pad, 128), dtype=npdt)
        rest_shards = [bdia_split_rest(blk, bd_spec) for blk in fmt_blocks]
    else:
        bd_idx = np.zeros((SL, 0, 1, 128), dtype=np.int8)
        bd_vals = np.zeros((SL, 0, 1, 128), dtype=npdt)

    # bdia 'rest' entries: boundary-compacted local-gather ELL
    if use_dia == "bdia":
        Wr = max(_gall(tr, max(
            (int(np.diff(r.indptr).max()) if r.nnz else 0)
            for r in rest_shards)))
        Br = max(_gall(tr, max(
            int(np.count_nonzero(np.diff(r.indptr)))
            for r in rest_shards)))
        Br = _round_up(Br, lane_pad) if Br else 0
    else:
        Wr = Br = 0
    rest_rows = np.full((SL, Br), fmt_R, dtype=np.int32)
    rest_cols = np.zeros((SL, Wr, Br), dtype=np.int32)
    rest_vals = np.zeros((SL, Wr, Br), dtype=npdt)

    if use_dia == "dia":
        if len(union) == 0:
            union = np.zeros(1, dtype=np.int64)
        K = len(union)
        dia_offsets = tuple(int(o) for o in union)
        dia_pad = max(1, int(np.abs(union).max()))
        if embed_kind != "none":
            # embedded DIA is forward-only: keep real ELL of the ORIGINAL
            # block for the transpose path
            W_on = max(_gall(tr, max(
                1, max((int(np.diff(s.on_proc.indptr).max())
                        if s.on_proc.nnz else 0) for s in shards))))
        else:
            W_on = 1
        on_cols = np.zeros((SL, W_on, R), dtype=np.int32)
        on_vals = np.zeros((SL, W_on, R), dtype=npdt)
        dia_vals = np.zeros((SL, K, fmt_R), dtype=npdt)
    elif use_dia == "well":
        # on_cols holds WINDOW-RELATIVE cols over the wl-tiled row space
        W_on = max(1, wW)
        R_w = wl_T * wl_ba * 128
        fmt_R = R_w
        on_cols = np.zeros((SL, W_on, R_w), dtype=np.int32)
        on_vals = np.zeros((SL, W_on, R_w), dtype=npdt)
        dia_vals = np.zeros((SL, 1, 1), dtype=npdt)
        dia_pad, dia_offsets = 1, (0,)
    elif use_dia == "wellt":
        # sorted-scatter layout of the transposed block (swellt_arrays):
        # on_cols/on_vals = [T, Kp*128] meta/vals over the tiled SOURCE
        # (col) space; wl_jlo carries the sublane-major target-lane copy
        # and wl_ws the per-slot window bases
        fmt_R = wl_T * 128
        on_cols = np.zeros((SL, wl_T, max(1, sw_Kp) * 128),
                           dtype=np.int32)
        on_vals = np.zeros((SL, wl_T, max(1, sw_Kp) * 128), dtype=npdt)
        dia_vals = np.zeros((SL, 1, 1), dtype=npdt)
        dia_pad, dia_offsets = 1, (0,)
    else:
        if use_dia in ("bdia", "bell") and not need_transpose:
            W_on = 1   # ELL copy only serves spmv_T; skip when unused
        else:
            W_on = max(_gall(tr, max(
                1, max((int(np.diff(s.on_proc.indptr).max())
                        if s.on_proc.nnz else 0) for s in shards))))
        on_cols = np.zeros((SL, W_on, R), dtype=np.int32)
        on_vals = np.zeros((SL, W_on, R), dtype=npdt)
        dia_vals = np.zeros((SL, 1, fmt_R), dtype=npdt)
        dia_pad, dia_offsets = 1, (0,)

    off_rows = np.full((SL, B), R, dtype=np.int32)
    off_cols = np.zeros((SL, W_off, B), dtype=np.int32)
    off_vals = np.zeros((SL, W_off, B), dtype=npdt)
    row_mask = np.zeros((SL, R), dtype=npdt)
    col_mask = np.zeros((SL, C), dtype=npdt)
    if use_dia == "wellt":
        # wl_ws = per-slot window bases [T*Kp]; wl_jlo/wl_jhi unused
        wl_ws = np.zeros((SL, wl_T * max(1, sw_Kp)), dtype=np.int32)
        wl_jlo = np.zeros((SL, 1, 1), dtype=np.int32)
        wl_jhi = np.zeros((SL, 1, 1), dtype=np.int32)
    else:
        wl_ws = np.zeros((SL, wl_T), dtype=np.int32)
        wl_W = on_cols.shape[1] if use_dia == "well" else 1
        wl_jlo = np.zeros((SL, wl_T if use_dia == "well" else 1,
                           wl_W), dtype=np.int32)
        wl_jhi = np.zeros_like(wl_jlo)
    for s, blk in enumerate(shards):
        if use_dia == "dia":
            dia_vals[s] = dia_arrays(fmt_blocks[s], union, fmt_R,
                                     dtype=npdt)
            if embed_kind != "none":
                on_cols[s], on_vals[s] = ell_arrays(
                    blk.on_proc, R, on_cols.shape[1], dtype=npdt)
        elif use_dia == "well":
            (wl_ws[s], on_cols[s], on_vals[s], wl_jlo[s],
             wl_jhi[s]) = wind_ell_arrays(
                blk.on_proc, R, on_cols.shape[1], wl_wr, wl_ba, C,
                dtype=npdt)
        elif use_dia == "wellt":
            # sorted-scatter pack of the TRANSPOSED block (source rows
            # = x domain, targets = this matrix's rows)
            if sw_Kp > 0:
                on_cols[s], on_vals[s], wl_ws[s] = swellt_arrays(
                    blk.on_proc.transpose(), sw_Kp, dtype=npdt)
        else:
            if not ((use_dia in ("bdia", "bell"))
                    and not need_transpose):
                on_cols[s], on_vals[s] = ell_arrays(
                    blk.on_proc, R, on_cols.shape[1], dtype=npdt)
            if use_dia == "bell":
                bl_src[s], bl_idx[s], bl_vals[s] = bell_arrays(
                    fmt_blocks[s], A128, bl_Wb, dtype=npdt)
            if use_dia == "bdia":
                bd_idx[s], bd_vals[s] = bdia_arrays(
                    fmt_blocks[s], bd_spec, bd_idx.shape[2], dtype=npdt)
                if Br:
                    (rest_rows[s], rest_cols[s],
                     rest_vals[s]) = ell_boundary_arrays(
                        rest_shards[s], Wr, Br, fmt_R, dtype=npdt)
        if B:
            off_rows[s], off_cols[s], off_vals[s] = ell_boundary_arrays(
                blk.off_proc, W_off, B, R, dtype=npdt)
        row_mask[s, :blk.local_num_rows] = 1.0
        col_mask[s, :blk.on_proc_num_cols] = 1.0

    # batch all leaves into ONE device_put: per-leaf puts pay the
    # host->device round-trip latency ~20 times per matrix (seconds per
    # hierarchy through a remote relay)
    staged = dict(
        on_cols=on_cols, on_vals=_np_as(on_vals, npdt),
        off_rows=off_rows,
        off_cols=off_cols, off_vals=_np_as(off_vals, npdt),
        dia_vals=_np_as(dia_vals, npdt),
        bd_idx=bd_idx, bd_vals=_np_as(bd_vals, npdt),
        bl_src=bl_src, bl_idx=bl_idx, bl_vals=_np_as(bl_vals, npdt),
        rest_rows=rest_rows, rest_cols=rest_cols,
        rest_vals=_np_as(rest_vals, npdt),
        emb_idx=emb_idx, emb_mask=_np_as(emb_mask, npdt),
        wl_ws=wl_ws, wl_jlo=wl_jlo, wl_jhi=wl_jhi,
        send_idx=plan.send_idx, send_mask=_np_as(plan.send_mask, npdt),
        halo_src=plan.halo_src, slot_to_halo=plan.slot_to_halo,
        recv_mask=_np_as(plan.recv_mask, npdt),
        row_mask=_np_as(row_mask, npdt),
        col_mask=_np_as(col_mask, npdt),
    )
    dev = put_stacked(staged, mesh, tr=tr, first_shard=a.first_shard)

    return DeviceParCSR(
        **dev,
        rows_pad=R, cols_pad=C, halo_pad=plan.halo_pad, slot=plan.slot,
        dia_pad=dia_pad, dia_offsets=dia_offsets,
        bd_offsets=bd_offsets, bd_padb=bd_padb, bd_ba=bd_ba,
        wl_wr=wl_wr, wl_ba=wl_ba,
        on_format=use_dia, embed_kind=embed_kind, on_rows_pad=fmt_R,
        # transpose path exists unless the bdia/bell W_on==1 shortcut
        # skipped the ELL copy (dia/embed keeps it; plain dia transposes
        # in-format)
        has_t=not (use_dia in ("bdia", "bell")
                   and not need_transpose),
        global_num_rows=part.global_num_rows,
        global_num_cols=part.global_num_cols,
    )


# --- placement ---------------------------------------------------------------

def put_stacked(staged: dict, mesh: Mesh, tr=None,
                first_shard: int = 0) -> dict:
    """Place a dict of [S_local, ...] host arrays with the leading axis
    sharded over the mesh.

    In-process (tr=None): S_local covers the whole mesh — one batched
    ``device_put`` (per-leaf puts pay the host->device round trip ~20x
    per matrix). SPMD (tr set): each controller holds only its shards
    and builds the global arrays with
    ``jax.make_array_from_single_device_arrays`` — shard s of the
    leading axis lives on mesh device s, and this process uploads only
    its addressable slice [first_shard, first_shard + S_local)."""
    names = list(staged)
    arrs = [np.asarray(staged[k]) for k in names]
    ax = _leading_axes(mesh)
    shardings = [
        jax.sharding.NamedSharding(mesh, P(ax, *([None] * (a.ndim - 1))))
        for a in arrs]
    if tr is None:
        return dict(zip(names, jax.device_put(arrs, shardings)))
    S = mesh.devices.size
    devs = list(mesh.devices.flat)
    out = {}
    for k, arr, sh in zip(names, arrs, shardings):
        SL = arr.shape[0]
        gshape = (S,) + arr.shape[1:]
        pieces = [jax.device_put(arr[i:i + 1], devs[first_shard + i])
                  for i in range(SL)]
        out[k] = jax.make_array_from_single_device_arrays(
            gshape, sh, pieces)
    return out


def put_replicated(x: np.ndarray, mesh: Mesh, tr=None) -> jnp.ndarray:
    """Fully-replicated placement over the mesh (redundant coarse LU
    factors, par_multilevel.hpp:223-333). SPMD: every controller holds
    the identical value and uploads its addressable devices' copies."""
    x = np.asarray(x)
    sh = jax.sharding.NamedSharding(mesh, P())
    if tr is None:
        return jax.device_put(x, sh)
    pieces = [jax.device_put(x, d) for d in mesh.local_devices]
    return jax.make_array_from_single_device_arrays(x.shape, sh, pieces)


# --- vectors -----------------------------------------------------------------

def device_put_vector(x: np.ndarray, bounds: np.ndarray, pad: int,
                      mesh: Mesh, dtype=jnp.float64) -> jnp.ndarray:
    """Global host vector -> sharded padded [S, pad] device array."""
    S = len(bounds) - 1
    out = np.zeros((S, pad), dtype=np.float64)
    for s in range(S):
        n = int(bounds[s + 1] - bounds[s])
        out[s, :n] = x[bounds[s]:bounds[s + 1]]
    return _shard_leading(out, mesh, dtype)

def device_put_vector_local(x_locals, bounds: np.ndarray, pad: int,
                            mesh: Mesh, dtype=jnp.float64,
                            first_shard: int = 0, tr=None) -> jnp.ndarray:
    """Per-rank vector placement: ``x_locals`` holds ONLY this process's
    shard slices (list, one per local shard); the global [S, pad] device
    array is assembled via the SPMD path of ``put_stacked``."""
    target = np.dtype(jax.dtypes.canonicalize_dtype(dtype))
    SL = len(x_locals)
    out = np.zeros((SL, pad), dtype=target)
    for i, xl in enumerate(x_locals):
        s = first_shard + i
        n = int(bounds[s + 1] - bounds[s])
        assert len(xl) == n, (len(xl), n)
        out[i, :n] = xl
    return put_stacked({"v": out}, mesh, tr=tr,
                       first_shard=first_shard)["v"]


def host_vector(x: jnp.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Sharded padded [S, pad] -> global host vector."""
    x = np.asarray(x)
    return np.concatenate([
        x[s, :int(bounds[s + 1] - bounds[s])] for s in range(x.shape[0])])


# --- shard-level kernels (call inside shard_map; arrays have no shard axis) --

def halo_exchange(A: DeviceParCSR, x: jnp.ndarray) -> jnp.ndarray:
    """Forward halo exchange: local x [C] -> halo values [H].

    Reference: ParComm::communicate (core/comm_pkg.hpp:631-652)."""
    send = x[A.send_idx]  # [S, Q]
    recv = jax.lax.all_to_all(send, comm_axes(), split_axis=0,
                              concat_axis=0, tiled=True)
    return recv.reshape(-1)[A.halo_src]


def halo_exchange_T(A: DeviceParCSR, halo_vals: jnp.ndarray,
                    n_out: int) -> jnp.ndarray:
    """Transpose exchange with sum reduction: halo contributions [H] ->
    added back at the owning shard's local cols [n_out].

    Reference: ParComm::communicate_T (core/comm_pkg.hpp:756-800)."""
    buf = halo_vals[A.slot_to_halo] * A.recv_mask  # [S, Q]
    back = jax.lax.all_to_all(buf, comm_axes(), split_axis=0, concat_axis=0,
                              tiled=True)
    back = back * A.send_mask
    return jnp.zeros(n_out, dtype=halo_vals.dtype).at[
        A.send_idx.reshape(-1)].add(back.reshape(-1))


def on_spmv_shard(A: DeviceParCSR, x: jnp.ndarray) -> jnp.ndarray:
    """b = A_on x (on_proc block only), format-dispatched.

    For embedded transfer operators, the coarse axis lives at fine-aligned
    anchor slots: 'cols' scatters x into the embedded space first, 'rows'
    compacts the embedded result back down."""
    if A.embed_kind == "cols":
        # row-block gather: fine block j <- coarse block emb_idx[j]
        x2 = x.reshape(-1, 128)
        x = (x2[A.emb_idx] * A.emb_mask[:, None]).reshape(-1)
    if A.on_format == "dia":
        from raptor_tpu.device.pallas_kernels import (
            dia_spmv_pallas, use_pallas)
        out = None
        if use_pallas():
            out = dia_spmv_pallas(A.dia_offsets, A.dia_vals, x, A.dia_pad)
        if out is None:
            out = dia_spmv(A.dia_offsets, A.dia_vals, x, A.dia_pad)
    elif A.on_format == "well":
        from raptor_tpu.device.pallas_kernels import (
            wind_ell_spmv_pallas, use_pallas)
        out = None
        if use_pallas():
            out = wind_ell_spmv_pallas(A.wl_ws, A.on_cols, A.on_vals, x,
                                       A.wl_wr, A.wl_ba, A.rows_pad,
                                       jlo=A.wl_jlo, jhi=A.wl_jhi)
        if out is None:
            out = wind_ell_spmv(A.wl_ws, A.on_cols, A.on_vals, x,
                                A.wl_ba, A.wl_wr, A.rows_pad)
        return out
    elif A.on_format == "wellt":
        from raptor_tpu.device.pallas_kernels import (
            swellt_spmv_T_pallas, use_pallas)
        out = None
        if use_pallas():
            out = swellt_spmv_T_pallas(A.on_cols, A.on_vals,
                                       A.wl_ws, x, A.rows_pad)
        if out is None:
            out = swellt_spmv_T(A.on_cols, A.on_vals, A.wl_ws, x,
                                A.rows_pad)
        return out
    elif A.on_format == "bell":
        from raptor_tpu.device.pallas_kernels import (
            bell_spmv_pallas, use_pallas)
        out = None
        if use_pallas():
            out = bell_spmv_pallas(A.bl_src, A.bl_idx, A.bl_vals, x,
                                   A.on_rows_pad)
        if out is None:
            out = bell_spmv(A.bl_src, A.bl_idx, A.bl_vals, x,
                            A.on_rows_pad)
    elif A.on_format == "bdia":
        from raptor_tpu.device.pallas_kernels import (
            bdia_spmv_pallas, use_pallas)
        out = None
        if use_pallas():
            out = bdia_spmv_pallas(A.bd_offsets, A.bd_idx, A.bd_vals, x,
                                   A.bd_padb, A.bd_ba, A.on_rows_pad)
        if out is None:
            out = bdia_spmv(A.bd_offsets, A.bd_idx, A.bd_vals, x,
                            A.bd_padb, A.on_rows_pad)
        out = out + off_spmv(A.rest_rows, A.rest_cols, A.rest_vals, x,
                             A.on_rows_pad)
    else:
        return ell_spmv(A.on_cols, A.on_vals, x)
    if A.embed_kind == "rows":
        # compact: coarse block k <- fine block emb_idx[k]
        out = out.reshape(-1, 128)[A.emb_idx].reshape(-1) * A.row_mask
    return out


def on_spmv_T_shard(A: DeviceParCSR, x: jnp.ndarray) -> jnp.ndarray:
    if A.on_format == "dia" and A.embed_kind == "none":
        return dia_spmv_T(A.dia_offsets, A.dia_vals, x, A.cols_pad,
                          A.dia_pad)
    if A.on_format == "well":
        # reconstruct absolute cols; OOB pad scatters carry val 0
        cols = wind_ell_cols(A.wl_ws, A.on_cols, A.wl_ba)
        xp = jnp.pad(x, (0, A.on_vals.shape[1] - x.shape[0]))
        return ell_spmv_T(cols, A.on_vals, xp, A.cols_pad)
    if A.on_format == "wellt":
        # the packed arrays ARE the transpose: spmv_T = forward gather
        return swellt_spmv(A.on_cols, A.on_vals, A.wl_ws, x,
                           A.cols_pad)
    if not A.has_t:
        raise ValueError(
            "matrix was packed with need_transpose=False; rebuild with "
            "device_put_matrix(..., need_transpose=True) for spmv_T")
    # bdia / embedded blocks keep the original ELL for the transpose path
    return ell_spmv_T(A.on_cols, A.on_vals, x, A.cols_pad)


def spmv_shard(A: DeviceParCSR, x: jnp.ndarray) -> jnp.ndarray:
    """b = A x on one shard; x [C] local cols -> b [R] local rows."""
    halo = halo_exchange(A, x)
    b = on_spmv_shard(A, x)
    b = b + off_spmv(A.off_rows, A.off_cols, A.off_vals, halo, A.rows_pad)
    return b


def spmv_T_shard(A: DeviceParCSR, x: jnp.ndarray) -> jnp.ndarray:
    """b = A^T x on one shard; x [R] local rows -> b [C] local cols."""
    out = on_spmv_T_shard(A, x)
    halo_contrib = off_spmv_T(A.off_rows, A.off_cols, A.off_vals, x,
                              A.halo_pad)
    return out + halo_exchange_T(A, halo_contrib, A.cols_pad)


def residual_shard(A: DeviceParCSR, x: jnp.ndarray,
                   b: jnp.ndarray) -> jnp.ndarray:
    """r = b - A x (fused, par_spmv.cpp:211-280)."""
    return b - spmv_shard(A, x)


def dot_shard(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Global inner product (par_vector.cpp:101): local dot + psum."""
    return jax.lax.psum(jnp.vdot(x, y), comm_axes())


def norm_shard(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(dot_shard(x, x))


# --- jitted global entry points ----------------------------------------------

def leaf_specs(tree, axes=ROW_AXIS):
    """P(axes, None, ...) spec for every array leaf of a pytree."""
    return jax.tree.map(
        lambda l: P(axes, *([None] * (jnp.ndim(l) - 1))), tree)


def run_sharded(mesh: Mesh, shard_fn, args, out_specs):
    """Run ``shard_fn`` (written against single-shard arrays) under
    shard_map. Every array leaf of ``args`` must carry a leading shard axis,
    which is stripped inside; outputs are returned raw against ``out_specs``
    (use P(ROW_AXIS, ...) for sharded outputs the body returns with a leading
    [1, ...] axis, P() for psum-replicated scalars/arrays)."""
    def body(*a):
        a = jax.tree.map(lambda l: l[0], a)
        return shard_fn(*a)

    return jax.shard_map(body, mesh=mesh, in_specs=leaf_specs(args),
                         out_specs=out_specs)(*args)


def _unstack_specs(A: DeviceParCSR):
    """in_specs entry for the matrix pytree: shard the leading axis."""
    return DeviceParCSR(
        *([P(ROW_AXIS)] * len(_DATA_FIELDS)),
        **{f: getattr(A, f) for f in _META_FIELDS})


def _shard_op(op, mesh: Mesh, A: DeviceParCSR, *vecs):
    """Run a shard-level op under shard_map, squeezing the shard axis."""
    def body(Ash, *vs):
        Ash = jax.tree.map(lambda l: l[0], Ash)
        vs = [v[0] for v in vs]
        out = op(Ash, *vs)
        return out[None]

    specs_in = (_unstack_specs(A),) + tuple(P(ROW_AXIS, None) for _ in vecs)
    return jax.shard_map(body, mesh=mesh, in_specs=specs_in,
                         out_specs=P(ROW_AXIS, None))(A, *vecs)


@functools.partial(jax.jit, static_argnames=("mesh",))
def spmv(mesh: Mesh, A: DeviceParCSR, x: jnp.ndarray) -> jnp.ndarray:
    """Global b = A x over the mesh; x [S, C] -> b [S, R]."""
    return _shard_op(spmv_shard, mesh, A, x)


@functools.partial(jax.jit, static_argnames=("mesh",))
def spmv_T(mesh: Mesh, A: DeviceParCSR, x: jnp.ndarray) -> jnp.ndarray:
    """Global b = A^T x over the mesh; x [S, R] -> b [S, C]."""
    return _shard_op(spmv_T_shard, mesh, A, x)


@functools.partial(jax.jit, static_argnames=("mesh",))
def residual(mesh: Mesh, A: DeviceParCSR, x: jnp.ndarray,
             b: jnp.ndarray) -> jnp.ndarray:
    return _shard_op(residual_shard, mesh, A, x, b)
