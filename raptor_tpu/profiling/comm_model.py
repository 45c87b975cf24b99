"""Communication modeling / statistics.

Equivalent of profiling/profile_comm.cpp:1-369: classify a communication
schedule's messages by size class (short < 500B, eager < 8000B, rendezvous)
and locality (intra-host vs inter-host), reporting max counts and bytes per
shard. Works on the static plans, so the analysis is exact and free — no
instrumented run needed (the reference instruments MPI at runtime,
core/mpi_types.cpp:64-331)."""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from raptor_tpu.comm.plan import CommPlan
from raptor_tpu.comm.tap import TAPPlanHost

SHORT_CUTOFF = 500     # bytes (profile_comm.cpp:4)
EAGER_CUTOFF = 8000    # bytes (profile_comm.cpp:5)


def _classify(nbytes: int) -> str:
    if nbytes < SHORT_CUTOFF:
        return "short"
    if nbytes < EAGER_CUTOFF:
        return "eager"
    return "rendezvous"


@dataclasses.dataclass
class CommStats:
    n_msgs: Dict[str, int]
    n_bytes: Dict[str, int]
    max_msgs_per_shard: int
    max_bytes_per_shard: int
    intra_host_bytes: int
    inter_host_bytes: int

    def __str__(self):
        lines = ["comm model (bytes/messages by protocol class):"]
        for k in ("short", "eager", "rendezvous"):
            lines.append(f"  {k:10s}: {self.n_msgs.get(k, 0):6d} msgs, "
                         f"{self.n_bytes.get(k, 0):10d} B")
        lines.append(f"  max per shard: {self.max_msgs_per_shard} msgs, "
                     f"{self.max_bytes_per_shard} B")
        lines.append(f"  intra-host {self.intra_host_bytes} B / "
                     f"inter-host {self.inter_host_bytes} B")
        return "\n".join(lines)


def model_comm_plan(plan: CommPlan, word_bytes: int = 8,
                    shards_per_host: int = None) -> CommStats:
    """Analyze a plain halo-exchange plan (ParComm equivalent)."""
    S = plan.n_shards
    L = shards_per_host or S
    cnt = plan.send_mask.sum(axis=2).astype(np.int64)  # [S, S] values sent
    n_msgs, n_bytes = {}, {}
    per_shard_msgs = np.zeros(S, dtype=np.int64)
    per_shard_bytes = np.zeros(S, dtype=np.int64)
    intra = inter = 0
    for o in range(S):
        for r in range(S):
            if o == r or cnt[o, r] == 0:
                continue
            b = int(cnt[o, r]) * word_bytes
            cls = _classify(b)
            n_msgs[cls] = n_msgs.get(cls, 0) + 1
            n_bytes[cls] = n_bytes.get(cls, 0) + b
            per_shard_msgs[o] += 1
            per_shard_bytes[o] += b
            if o // L == r // L:
                intra += b
            else:
                inter += b
    return CommStats(n_msgs, n_bytes, int(per_shard_msgs.max()),
                     int(per_shard_bytes.max()), intra, inter)


def model_tap_plan(plan: TAPPlanHost, word_bytes: int = 8) -> CommStats:
    """Analyze a TAP plan: inter-host bytes are the deduplicated global-step
    values; intra-host bytes cover the L/S/R steps."""
    intra = int(plan.sendL_mask.sum() + plan.sendS_mask.sum()
                + plan.rpack_mask.sum()) * word_bytes
    inter = int(plan.dcn_values) * word_bytes
    msgs = {"eager": 0}
    return CommStats({"total": -1}, {"total": intra + inter}, -1, -1,
                     intra, inter)
