"""Node-aware (TAP) staging for the setup-phase transport.

The reference routes matrix-row communication through the 2-step
``tap_mat_comm`` (core/comm_pkg.hpp:1392-1451): values bound for a
remote NODE are combined inside the node first, cross the network as
ONE message per node pair, and are redistributed locally — cutting
inter-node message count from O(ranks^2) to O(nodes^2).

``TapGroup`` realizes the same schedule underneath ANY ``GroupBase``
wire (fork queues on one machine, TCP sockets across hosts): it
re-implements ``alltoall`` — the primitive every Transport operation
(halo fetch, transpose reduce, matrix-row fetch/reduce) is built on —
as intra-node gather -> one inter-node exchange per node pair ->
intra-node scatter. ``MultiProcessTransport(TapGroup(base, ppn), a)``
therefore gives the whole distributed setup pipeline node-aware
communication with no changes elsewhere.

Inter-node sends are counted (``inter_sends``) so tests can assert the
reduction against the flat schedule.
"""

from __future__ import annotations

from typing import List

from raptor_tpu.comm.multiproc import GroupBase


class TapGroup(GroupBase):
    """Two-level collective schedule over a base group.

    ``ppn``: ranks per node (reference Topology PPN,
    core/topology.hpp:32-171); world must be a multiple. Rank r lives
    on node r // ppn. For the node pair (A -> B), the aggregator in A
    is rank A*ppn + (B % ppn) and the distributor in B is rank
    B*ppn + (A % ppn) — each rank handles ~n_nodes/ppn remote nodes, so
    staging work is spread across the node (form_global_par_comm's
    balancing idea, core/tap_comm.cpp:355)."""

    def __init__(self, base: GroupBase, ppn: int):
        assert base.world % ppn == 0, (base.world, ppn)
        self.base = base
        self.ppn = int(ppn)
        self.rank = base.rank
        self.world = base.world
        self.n_nodes = base.world // ppn
        self.node = self.rank // ppn
        self.inter_sends = 0
        self.intra_sends = 0

    # P2P passes through (used by gather0_bcast etc.)
    def next_seq(self) -> int:
        return self.base.next_seq()

    def send(self, dst: int, tag, payload) -> None:
        self.base.send(dst, tag, payload)

    def recv(self, tag, src: int):
        return self.base.recv(tag, src)

    def _agg(self, dst_node: int) -> int:
        """My node's aggregator rank for messages to ``dst_node``."""
        return self.node * self.ppn + (dst_node % self.ppn)

    def _dist(self, src_node: int, dst_node: int) -> int:
        """dst_node's distributor rank for messages from ``src_node``."""
        return dst_node * self.ppn + (src_node % self.ppn)

    def alltoall(self, payloads: List) -> List:
        """3-step node-aware all-to-all (comm_pkg.hpp:1508-1573
        schedule): L (intra-node directs) in parallel with S (gather to
        aggregators) -> one inter-node message per node pair -> R
        (intra-node redistribution)."""
        base = self.base
        seq = base.next_seq()
        ppn, node, rank = self.ppn, self.node, self.rank

        # L: intra-node destinations go direct
        for d in range(node * ppn, (node + 1) * ppn):
            base.send(d, (seq, "tapL"), payloads[d])
            self.intra_sends += int(d != rank)

        # S: hand each remote node's bundle to my node's aggregator
        for N in range(self.n_nodes):
            if N == node:
                continue
            bundle = {d: payloads[d]
                      for d in range(N * ppn, (N + 1) * ppn)}
            a = self._agg(N)
            base.send(a, (seq, "tapS", N), bundle)
            self.intra_sends += int(a != rank)

        # G: aggregators combine their node's bundles -> one message per
        # node pair, sent to the remote distributor
        for N in range(self.n_nodes):
            if N == node or self._agg(N) != rank:
                continue
            combined = {src: base.recv((seq, "tapS", N), src)
                        for src in range(node * ppn, (node + 1) * ppn)}
            base.send(self._dist(node, N), (seq, "tapG", node), combined)
            self.inter_sends += 1

        # R: distributors unpack and deliver locally
        for M in range(self.n_nodes):
            if M == node or self._dist(M, node) != rank:
                continue
            combined = base.recv((seq, "tapG", M), self._agg_of(M, node))
            for d in range(node * ppn, (node + 1) * ppn):
                base.send(d, (seq, "tapR", M),
                          {src: combined[src][d] for src in combined})
                self.intra_sends += int(d != rank)

        # collect: local directs + one packet per remote node
        out = [None] * self.world
        for s in range(node * ppn, (node + 1) * ppn):
            out[s] = base.recv((seq, "tapL"), s)
        for M in range(self.n_nodes):
            if M == node:
                continue
            packet = base.recv((seq, "tapR", M), self._dist(M, node))
            for src, v in packet.items():
                out[src] = v
        return out

    def _agg_of(self, src_node: int, dst_node: int) -> int:
        """Aggregator rank in ``src_node`` for traffic to ``dst_node``
        (the sender of the (seq, 'tapG', src_node) message)."""
        return src_node * self.ppn + (dst_node % self.ppn)
