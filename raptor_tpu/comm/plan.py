"""Static halo-exchange communication plans.

Equivalent of the reference's ``ParComm`` construction
(core/comm_pkg.hpp:302-986, ``init_par_comm`` :432-495): discover, for every
shard, which remote columns its off_proc block references, who owns them, and
the exact send/recv schedule. The reference does this with MPI allreduce +
probe handshakes at matrix-finalize time; here the host sees every shard, so
the schedule is computed directly and compiled into *static index arrays*:

- ``send_idx[s, d, q]``  : the q-th local column index shard ``s`` must send
  to shard ``d``  (NonContigData ``indices``, core/comm_data.hpp:665).
- ``halo_src[s, h]``     : flat (src*Q+q) recv-buffer slot holding halo
  column ``h`` (ContigData's "messages land in off_proc column order",
  core/comm_data.hpp:302).
- ``slot_to_halo[s, d, q]`` + masks: the inverse, used by the transpose
  (reduction) exchange (``communicate_T``, core/comm_pkg.hpp:756-800).

On device the schedule becomes: gather -> ``lax.all_to_all`` (one fused ICI
collective) -> gather, with XLA overlapping it against on_proc compute.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np

from raptor_tpu.core.par_matrix import ParCSRMatrix


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class CommPlan:
    """Stacked-over-shards static halo exchange schedule."""

    n_shards: int
    slot: int              # Q: max entries sent between any shard pair
    halo_pad: int          # H: padded halo size (max over shards)
    send_idx: np.ndarray   # [S, S, Q] int32, local col ids, pad->0
    send_mask: np.ndarray  # [S, S, Q] float, 1 where send_idx valid
    halo_src: np.ndarray   # [S, H] int32, flat recv slot per halo col, pad->0
    halo_mask: np.ndarray  # [S, H] float
    slot_to_halo: np.ndarray  # [S, S, Q] int32, halo pos per recv slot
    recv_mask: np.ndarray  # [S, S, Q] float, 1 where recv slot valid
    n_halo: np.ndarray     # [S] true halo sizes


def build_comm_plan(a: ParCSRMatrix, lane_pad: int = 1) -> CommPlan:
    """Build the halo exchange plan for matrix ``a``'s off_proc columns."""
    part = a.partition
    S = part.n_shards
    shards = a.shards()

    # For each (owner, requester) pair: owner-local col indices requested,
    # ordered by the requester's halo (= global col) order.
    pair_cols: List[List[np.ndarray]] = [[None] * S for _ in range(S)]
    pair_halo_pos: List[List[np.ndarray]] = [[None] * S for _ in range(S)]
    for r in range(S):
        cmap = shards[r].off_proc_column_map
        owners = part.col_owner(cmap)
        for o in np.unique(owners):
            sel = owners == o
            pair_cols[int(o)][r] = (cmap[sel] - part.col_bounds[int(o)]
                                    ).astype(np.int32)
            pair_halo_pos[int(o)][r] = np.nonzero(sel)[0].astype(np.int32)

    cnt = np.zeros((S, S), dtype=np.int64)
    for o in range(S):
        for r in range(S):
            if pair_cols[o][r] is not None:
                cnt[o, r] = len(pair_cols[o][r])
    Q = max(1, int(cnt.max()))
    H = max(1, _round_up(max(1, max(len(s.off_proc_column_map)
                                    for s in shards)), lane_pad))

    send_idx = np.zeros((S, S, Q), dtype=np.int32)
    send_mask = np.zeros((S, S, Q), dtype=np.float64)
    halo_src = np.zeros((S, H), dtype=np.int32)
    halo_mask = np.zeros((S, H), dtype=np.float64)
    slot_to_halo = np.zeros((S, S, Q), dtype=np.int32)
    recv_mask = np.zeros((S, S, Q), dtype=np.float64)
    n_halo = np.array([len(s.off_proc_column_map) for s in shards],
                      dtype=np.int64)

    for o in range(S):
        for r in range(S):
            c = int(cnt[o, r])
            if c == 0:
                continue
            send_idx[o, r, :c] = pair_cols[o][r]
            send_mask[o, r, :c] = 1.0
            hpos = pair_halo_pos[o][r]
            halo_src[r, hpos] = o * Q + np.arange(c, dtype=np.int32)
            halo_mask[r, hpos] = 1.0
            slot_to_halo[r, o, :c] = hpos
            recv_mask[r, o, :c] = 1.0

    return CommPlan(S, Q, H, send_idx, send_mask, halo_src, halo_mask,
                    slot_to_halo, recv_mask, n_halo)


def build_comm_plan_spmd(a: ParCSRMatrix, tr, lane_pad: int = 1) -> CommPlan:
    """Rank-local plan build over a ``Transport``: the init_par_comm
    handshake (core/comm_pkg.hpp:432-495) — each rank derives its recv
    schedule from its own off_proc column map, learns its send schedule
    from an all-to-all of wanted-column lists, and agrees on the global
    pads (Q, H) by an allgather of local maxima. Produces arrays whose
    leading dim covers only the LOCAL shards; with every shard local it
    is value-identical to ``build_comm_plan``."""
    part = a.partition
    S = part.n_shards
    shards = a.shards()
    SL = len(shards)
    fs = a.first_shard

    cmaps = [np.asarray(blk.off_proc_column_map) for blk in shards]
    owners_l = [part.col_owner(m) for m in cmaps]
    # requester side: what each of my shards wants from every owner
    req = []
    halo_pos = []
    for i in range(SL):
        per_o = [np.zeros(0, dtype=np.int64)] * S
        pos_o = [np.zeros(0, dtype=np.int64)] * S
        for o in np.unique(owners_l[i]):
            sel = owners_l[i] == o
            per_o[int(o)] = cmaps[i][sel]
            pos_o[int(o)] = np.nonzero(sel)[0]
        req.append(per_o)
        halo_pos.append(pos_o)
    got = tr.alltoall_obj(req)   # got[i][r] = cols requester r wants of me

    q_loc = max([1] + [len(g) for gi in got for g in gi]
                + [len(x) for ri in req for x in ri])
    h_loc = max([1] + [len(m) for m in cmaps])
    Q = int(max(tr.allgather_obj(q_loc)))
    H = _round_up(int(max(tr.allgather_obj(h_loc))), lane_pad)

    send_idx = np.zeros((SL, S, Q), dtype=np.int32)
    send_mask = np.zeros((SL, S, Q), dtype=np.float64)
    halo_src = np.zeros((SL, H), dtype=np.int32)
    halo_mask = np.zeros((SL, H), dtype=np.float64)
    slot_to_halo = np.zeros((SL, S, Q), dtype=np.int32)
    recv_mask = np.zeros((SL, S, Q), dtype=np.float64)
    n_halo = np.array([len(m) for m in cmaps], dtype=np.int64)

    for i in range(SL):
        s = fs + i
        c0 = int(part.col_bounds[s])
        for r in range(S):
            cr = len(got[i][r])
            if cr:
                send_idx[i, r, :cr] = (np.asarray(got[i][r],
                                                  dtype=np.int64) - c0)
                send_mask[i, r, :cr] = 1.0
        for o in range(S):
            c = len(halo_pos[i][o])
            if c:
                hpos = halo_pos[i][o]
                halo_src[i, hpos] = o * Q + np.arange(c, dtype=np.int32)
                halo_mask[i, hpos] = 1.0
                slot_to_halo[i, o, :c] = hpos
                recv_mask[i, o, :c] = 1.0

    return CommPlan(S, Q, H, send_idx, send_mask, halo_src, halo_mask,
                    slot_to_halo, recv_mask, n_halo)
