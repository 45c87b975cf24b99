"""Topology-aware (node-aware) halo exchange — the TAPComm equivalent.

The reference's TAPComm (core/comm_pkg.hpp:1020-1839, core/tap_comm.cpp,
arXiv:1612.08060) decomposes the halo exchange into intra-node and one
inter-node step, deduplicating values per node pair. The TPU-native mapping
uses a 2-D mesh (``host``, ``local``): ICI within a host, DCN across hosts.

Forward exchange = 4 static steps (3-step TAPComm analog):
  L: intra-host all_to_all for same-host halo values        (local_L)
  S: owners send inter-host values to the pair gateway       (local_S)
  G: one all_to_all across the host axis, gateway-to-gateway (global)
  R: gateways redistribute to the requesting shards          (local_R)

Each (src_host A, dst_host B) pair's column set is deduplicated (a column
needed by several shards of B crosses DCN once) and handled by the gateway
with local index (A + B) % L on both sides, spreading host-pair traffic over
a host's shards. Transpose exchange reverses each step with sum reductions
(DuplicateData::communicate_T semantics, core/comm_data.hpp:1064-1424).

All schedules are static index arrays compiled into the jitted program.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.core.par_matrix import ParCSRMatrix

HOST_AXIS = "host"
LOCAL_AXIS = "local"


@dataclasses.dataclass
class TAPPlanHost:
    """Host-side numpy plan (stacked over S = H*L shards)."""
    H: int
    L: int
    # L step (intra-host direct)
    sendL_idx: np.ndarray    # [S, L, QL]
    sendL_mask: np.ndarray
    haloL_src: np.ndarray    # [S, Hpad] flat L*QL slot
    haloL_mask: np.ndarray
    slotL_to_halo: np.ndarray  # [S, L, QL]
    recvL_mask: np.ndarray
    # S step (owner -> gateway, intra-host)
    sendS_idx: np.ndarray    # [S, L, QS] owner-local col ids
    sendS_mask: np.ndarray
    # G step (gateway -> gateway, across hosts)
    gpack_idx: np.ndarray    # [S, H, QG] flat L*QS index into S-recv
    gpack_mask: np.ndarray
    # R step (gateway -> requester, intra-host)
    rpack_idx: np.ndarray    # [S, L, QR] flat H*QG index into G-recv
    rpack_mask: np.ndarray
    haloR_src: np.ndarray    # [S, Hpad] flat L*QR slot
    haloR_mask: np.ndarray
    slotR_to_halo: np.ndarray  # [S, L, QR] halo position per R-recv slot
    recvR_mask: np.ndarray
    # reverse-direction scatter targets
    revR_target: np.ndarray  # [S, L, QR] flat H*QG slot fed by this R slot
    revG_target: np.ndarray  # [S, H, QG] flat L*QS slot fed by this G slot
    halo_pad: int
    # diagnostics
    dcn_values: int          # total deduplicated values crossing hosts
    dcn_values_plain: int    # without dedup (plain ParComm equivalent)


def build_tap_plan(a: ParCSRMatrix, H: int, L: int,
                   lane_pad: int = 1) -> TAPPlanHost:
    col_maps = [np.asarray(blk.off_proc_column_map) for blk in a.shards()]
    return build_tap_plan_from_maps(col_maps, a.partition, H, L, lane_pad)


def build_tap_plan_from_maps(col_maps, part, H: int, L: int,
                             lane_pad: int = 1) -> TAPPlanHost:
    """Build the TAP schedule from each shard's off-proc column map only
    (the plan needs no matrix values). This is the multi-controller
    entry: each controller allgathers its local shards' (small) halo
    column maps over the setup transport and then deterministically
    builds the identical global plan — the same construction TAPComm
    does collectively over MPI (core/tap_comm.cpp:24-120)."""
    S = part.n_shards
    assert S == H * L, (S, H, L)
    assert len(col_maps) == S, (len(col_maps), S)

    def host_of(s):
        return s // L

    def local_of(s):
        return s % L

    def gateway(A, B):
        return (A + B) % L

    # --- classify halo columns per requester ---------------------------------
    # same-host pairs -> L plan; cross-host -> U[A][B] dedup sets
    pairL_cols = {}       # (owner, req) -> owner-local col ids (halo order)
    pairL_hpos = {}
    U = {}                # (A, B) -> sorted unique global col list
    req_remote = {}       # (req, A) -> (global cols, halo positions)
    for r in range(S):
        cmap = col_maps[r]
        owners = part.col_owner(cmap)
        B = host_of(r)
        for o in np.unique(owners):
            sel = owners == o
            cols = cmap[sel]
            hpos = np.nonzero(sel)[0]
            A = host_of(int(o))
            if A == B:
                pairL_cols[(int(o), r)] = (
                    cols - part.col_bounds[int(o)]).astype(np.int64)
                pairL_hpos[(int(o), r)] = hpos
            else:
                key = (A, B)
                U.setdefault(key, set()).update(cols.tolist())
                g, p = req_remote.setdefault((r, A), ([], []))
                g.extend(cols.tolist())
                p.extend(hpos.tolist())

    U = {k: np.array(sorted(v), dtype=np.int64) for k, v in U.items()}
    dcn_values = sum(len(v) for v in U.values())
    dcn_plain = sum(len(g) for (r, A), (g, p) in req_remote.items())

    Hpad = max(1, max(len(c) for c in col_maps))
    Hpad = ((Hpad + lane_pad - 1) // lane_pad) * lane_pad

    # --- L step arrays ---------------------------------------------------------
    cntL = np.zeros((S, S), dtype=np.int64)
    for (o, r), cols in pairL_cols.items():
        cntL[o, r] = len(cols)
    QL = max(1, int(cntL.max()))
    sendL_idx = np.zeros((S, L, QL), dtype=np.int32)
    sendL_mask = np.zeros((S, L, QL))
    haloL_src = np.zeros((S, Hpad), dtype=np.int32)
    haloL_mask = np.zeros((S, Hpad))
    slotL_to_halo = np.zeros((S, L, QL), dtype=np.int32)
    recvL_mask = np.zeros((S, L, QL))
    for (o, r), cols in pairL_cols.items():
        lo, lr = local_of(o), local_of(r)
        c = len(cols)
        sendL_idx[o, lr, :c] = cols
        sendL_mask[o, lr, :c] = 1.0
        hpos = pairL_hpos[(o, r)]
        haloL_src[r, hpos] = lo * QL + np.arange(c)
        haloL_mask[r, hpos] = 1.0
        slotL_to_halo[r, lo, :c] = hpos
        recvL_mask[r, lo, :c] = 1.0

    # --- S step: owner -> gateway ------------------------------------------------
    # owner shard o (host A) sends, for each pair (A,B) with gateway g,
    # the values of its own columns in U[A,B], ordered by (B, col).
    send_lists = {}    # (o, g_local) -> list of (owner-local col, B, k)
    for (A, B), cols in U.items():
        g = gateway(A, B)
        owners = part.col_owner(cols)
        for k, (gc, o) in enumerate(zip(cols, owners)):
            o = int(o)
            send_lists.setdefault((o, g), []).append(
                (int(gc - part.col_bounds[o]), B, k))
    QS = max(1, max((len(v) for v in send_lists.values()), default=1))
    sendS_idx = np.zeros((S, L, QS), dtype=np.int32)
    sendS_mask = np.zeros((S, L, QS))
    # gateway-side: locate each (A,B,k) entry in the gateway's S-recv buffer
    entry_slot = {}    # (A, B, k) -> (gateway shard, flat L*QS index)
    for (o, g), lst in sorted(send_lists.items()):
        A = host_of(o)
        lo = local_of(o)
        gshard = A * L + g
        for q, (cloc, B, k) in enumerate(lst):
            sendS_idx[o, g, q] = cloc
            sendS_mask[o, g, q] = 1.0
            entry_slot[(A, B, k)] = (gshard, lo * QS + q)

    # --- G step: gateway -> gateway ------------------------------------------------
    QG = max(1, max((len(v) for v in U.values()), default=1))
    gpack_idx = np.zeros((S, H, QG), dtype=np.int32)
    gpack_mask = np.zeros((S, H, QG))
    revG_target = np.zeros((S, H, QG), dtype=np.int32)
    for (A, B), cols in U.items():
        g = gateway(A, B)
        gshard = A * L + g
        for k in range(len(cols)):
            gs, flat = entry_slot[(A, B, k)]
            assert gs == gshard
            gpack_idx[gshard, B, k] = flat
            gpack_mask[gshard, B, k] = 1.0
            revG_target[gshard, B, k] = flat

    # --- R step: receiving gateway -> requesters -----------------------------------
    # receiving gateway (B, gateway(A,B)) holds G-recv [H, QG];
    # U[A,B][k] lives at flat A*QG + k.
    rsend_lists = {}   # (gshard_recv, req_local) -> list of (A, k, halo_pos)
    for (r, A), (gcols, hpos) in req_remote.items():
        B = host_of(r)
        g = gateway(A, B)
        gshard = B * L + g
        cols_u = U[(A, B)]
        ks = np.searchsorted(cols_u, np.array(gcols))
        for k, hp in zip(ks, hpos):
            rsend_lists.setdefault((gshard, local_of(r)), []).append(
                (A, int(k), hp))
    QR = max(1, max((len(v) for v in rsend_lists.values()), default=1))
    rpack_idx = np.zeros((S, L, QR), dtype=np.int32)
    rpack_mask = np.zeros((S, L, QR))
    haloR_src = np.zeros((S, Hpad), dtype=np.int32)
    haloR_mask = np.zeros((S, Hpad))
    slotR_to_halo = np.zeros((S, L, QR), dtype=np.int32)
    recvR_mask = np.zeros((S, L, QR))
    revR_target = np.zeros((S, L, QR), dtype=np.int32)
    for (gshard, lr), lst in sorted(rsend_lists.items()):
        B = host_of(gshard)
        gl = local_of(gshard)
        r = B * L + lr
        for q, (A, k, hp) in enumerate(lst):
            rpack_idx[gshard, lr, q] = A * QG + k
            rpack_mask[gshard, lr, q] = 1.0
            # requester r: R-recv [L, QR], slot (gl, q)
            haloR_src[r, hp] = gl * QR + q
            haloR_mask[r, hp] = 1.0
            slotR_to_halo[r, gl, q] = hp
            recvR_mask[r, gl, q] = 1.0
            revR_target[gshard, lr, q] = A * QG + k

    return TAPPlanHost(
        H=H, L=L,
        sendL_idx=sendL_idx, sendL_mask=sendL_mask,
        haloL_src=haloL_src, haloL_mask=haloL_mask,
        slotL_to_halo=slotL_to_halo, recvL_mask=recvL_mask,
        sendS_idx=sendS_idx, sendS_mask=sendS_mask,
        gpack_idx=gpack_idx, gpack_mask=gpack_mask,
        rpack_idx=rpack_idx, rpack_mask=rpack_mask,
        haloR_src=haloR_src, haloR_mask=haloR_mask,
        slotR_to_halo=slotR_to_halo, recvR_mask=recvR_mask,
        revR_target=revR_target, revG_target=revG_target,
        halo_pad=Hpad, dcn_values=dcn_values, dcn_values_plain=dcn_plain)


# --- device pytree -------------------------------------------------------------

_TAP_DATA = ["sendL_idx", "sendL_mask", "haloL_src", "haloL_mask",
             "slotL_to_halo", "recvL_mask", "sendS_idx", "sendS_mask",
             "gpack_idx", "gpack_mask", "rpack_idx", "rpack_mask",
             "haloR_src", "haloR_mask", "slotR_to_halo", "recvR_mask",
             "revR_target", "revG_target"]
_TAP_META = ["H", "L", "QL", "QS", "QG", "QR", "halo_pad"]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=_TAP_DATA, meta_fields=_TAP_META)
@dataclasses.dataclass
class DeviceTAP:
    sendL_idx: jnp.ndarray
    sendL_mask: jnp.ndarray
    haloL_src: jnp.ndarray
    haloL_mask: jnp.ndarray
    slotL_to_halo: jnp.ndarray
    recvL_mask: jnp.ndarray
    sendS_idx: jnp.ndarray
    sendS_mask: jnp.ndarray
    gpack_idx: jnp.ndarray
    gpack_mask: jnp.ndarray
    rpack_idx: jnp.ndarray
    rpack_mask: jnp.ndarray
    haloR_src: jnp.ndarray
    haloR_mask: jnp.ndarray
    slotR_to_halo: jnp.ndarray
    recvR_mask: jnp.ndarray
    revR_target: jnp.ndarray
    revG_target: jnp.ndarray
    H: int
    L: int
    QL: int
    QS: int
    QG: int
    QR: int
    halo_pad: int


def device_put_tap(plan: TAPPlanHost, mesh, dtype=jnp.float64,
                   tr=None, first_shard: int = 0,
                   n_local: int = None) -> DeviceTAP:
    """Place the stacked [S, ...] plan arrays shard-per-device.

    ``tr=None`` (single controller): plain sharded device_put. With a
    transport (multi-controller), every controller holds the identical
    global plan (built from allgathered column maps) but may address
    only its own devices — each uploads just its
    [first_shard, first_shard + n_local) slices."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def conv(x):
        x = np.asarray(x)
        if x.dtype.kind != "i":
            x = np.asarray(x, dtype=jax.dtypes.canonicalize_dtype(dtype))
        return x

    if tr is None:
        def put(arr):
            spec = P((HOST_AXIS, LOCAL_AXIS),
                     *([None] * (arr.ndim - 1)))
            return jax.device_put(arr, NamedSharding(mesh, spec))
        kw = {f: put(conv(getattr(plan, f))) for f in _TAP_DATA}
    else:
        from raptor_tpu.device import par as dpar
        staged = {f: conv(getattr(plan, f))[first_shard:
                                            first_shard + n_local]
                  for f in _TAP_DATA}
        kw = dpar.put_stacked(staged, mesh, tr=tr,
                              first_shard=first_shard)
    return DeviceTAP(
        **kw, H=plan.H, L=plan.L, QL=plan.sendL_idx.shape[-1],
        QS=plan.sendS_idx.shape[-1], QG=plan.gpack_idx.shape[-1],
        QR=plan.rpack_idx.shape[-1], halo_pad=plan.halo_pad)


# --- shard-level exchanges (inside shard_map over (host, local)) ----------------

def tap_halo_exchange(T: DeviceTAP, x: jnp.ndarray) -> jnp.ndarray:
    """Forward 3-step exchange (TAPComm::communicate,
    core/comm_pkg.hpp:1508-1573). x: local cols [C] -> halo [Hpad]."""
    a2a = lambda buf, ax: jax.lax.all_to_all(buf, ax, split_axis=0,
                                             concat_axis=0, tiled=True)
    # L: direct intra-host
    recvL = a2a(x[T.sendL_idx], LOCAL_AXIS)          # [L, QL]
    # S: owners -> gateways (intra-host)
    recvS = a2a(x[T.sendS_idx], LOCAL_AXIS)          # [L, QS]
    # G: gateway -> gateway (across hosts)
    gsend = recvS.reshape(-1)[T.gpack_idx] * T.gpack_mask
    recvG = a2a(gsend, HOST_AXIS)                    # [H, QG]
    # R: gateways -> requesters (intra-host)
    rsend = recvG.reshape(-1)[T.rpack_idx] * T.rpack_mask
    recvR = a2a(rsend, LOCAL_AXIS)                   # [L, QR]
    # assemble halo in off_proc column order
    halo = (T.haloL_mask * recvL.reshape(-1)[T.haloL_src]
            + T.haloR_mask * recvR.reshape(-1)[T.haloR_src])
    return halo


def tap_halo_exchange_T(T: DeviceTAP, halo_vals: jnp.ndarray,
                        n_out: int) -> jnp.ndarray:
    """Transpose 3-step exchange with sum reductions
    (TAPComm::communicate_T, core/comm_pkg.hpp:1575-1720)."""
    a2a = lambda buf, ax: jax.lax.all_to_all(buf, ax, split_axis=0,
                                             concat_axis=0, tiled=True)
    # reverse L
    bufL = halo_vals[T.slotL_to_halo] * T.recvL_mask
    backL = a2a(bufL, LOCAL_AXIS) * T.sendL_mask
    out = jnp.zeros(n_out, dtype=halo_vals.dtype).at[
        T.sendL_idx.reshape(-1)].add(backL.reshape(-1))
    # reverse R: requesters -> gateways, summed into G layout
    bufR = halo_vals[T.slotR_to_halo] * T.recvR_mask
    backR = a2a(bufR, LOCAL_AXIS) * T.rpack_mask     # [L, QR] at gateway
    gbuf = jnp.zeros(T.H * T.QG, dtype=halo_vals.dtype).at[
        T.revR_target.reshape(-1)].add(backR.reshape(-1))
    gbuf = gbuf.reshape(T.H, T.QG)
    # reverse G
    backG = a2a(gbuf, HOST_AXIS) * T.gpack_mask      # [H, QG] at src gateway
    sbuf = jnp.zeros(T.L * T.QS, dtype=halo_vals.dtype).at[
        T.revG_target.reshape(-1)].add(backG.reshape(-1))
    sbuf = sbuf.reshape(T.L, T.QS)
    # reverse S: gateways -> owners
    backS = a2a(sbuf, LOCAL_AXIS) * T.sendS_mask
    out = out.at[T.sendS_idx.reshape(-1)].add(backS.reshape(-1))
    return out
