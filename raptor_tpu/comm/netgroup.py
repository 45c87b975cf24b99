"""Network process group: tagged P2P over TCP sockets, bootstrapped by a
key-value rendezvous (jax.distributed's coordinator by default).

This is the DCN-capable wire the setup-phase ``Transport`` runs on — the
TPU build's analog of the reference's MPI byte channel
(core/comm_data.hpp Isend/Irecv message schedules): every rank listens
on a socket, publishes ``host:port`` through the rendezvous, and peers
exchange length-prefixed pickled-NumPy messages over direct connections
(one duplex socket per rank pair, lazily established, background reader
per peer). ``MultiProcessTransport(SocketGroup(...), a_local)`` then
gives the full setup transport across real hosts; the same group drives
the SPMD setup -> device solve bridge under multi-controller
``jax.distributed`` runs (each controller's addressable chips + this
group's setup comm = the reference's "rank" with its MPI communicator).

Single-machine twin: ``multiproc.ProcessGroup`` (fork + queues) shares
the collective layer through ``GroupBase``.
"""

from __future__ import annotations

import os
import pickle
import socket
import struct
import threading
from typing import Dict, Tuple

from raptor_tpu.comm.multiproc import GroupBase

_LEN = struct.Struct(">Q")
_HELLO = struct.Struct(">I")


def _default_kv():
    """jax.distributed's coordinator KV store (gRPC — reaches across
    hosts); requires jax.distributed.initialize() in this process."""
    from jax._src import distributed
    client = distributed.global_state.client
    assert client is not None, \
        "SocketGroup needs jax.distributed.initialize() or an explicit kv"
    return client


def _my_host() -> str:
    h = os.environ.get("RAPTOR_TPU_NET_HOST")
    if h:
        return h
    try:
        # route-based local address discovery (no traffic is sent)
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.connect(("10.255.255.255", 1))
        out = s.getsockname()[0]
        s.close()
        return out
    except OSError:
        return "127.0.0.1"


class SocketGroup(GroupBase):
    """Tagged P2P + collectives over TCP for ``world`` ranks.

    ``kv``: rendezvous with ``key_value_set(k, v)`` /
    ``blocking_key_value_get(k, timeout_ms)`` (default: the
    jax.distributed coordinator client). ``prefix`` namespaces the
    rendezvous keys so several groups can share one coordinator."""

    def __init__(self, rank: int, world: int, kv=None,
                 prefix: str = "raptor_net", host: str = None,
                 timeout_ms: int = 900_000):
        self.rank = int(rank)
        self.world = int(world)
        self._seq = 0
        self._kv = kv if kv is not None else _default_kv()
        self._stash: Dict[Tuple, object] = {}
        self._cv = threading.Condition()
        self._conns: Dict[int, socket.socket] = {}
        self._wlocks: Dict[int, threading.Lock] = {}
        # peers legitimately spend minutes in local compute stages at
        # scale (native SpGEMM/interpolation on large levels), so the
        # liveness timeout defaults high and is env-tunable
        # (RAPTOR_TPU_NET_TIMEOUT_MS); it guards against dead peers,
        # not slow ones
        env_ms = os.environ.get("RAPTOR_TPU_NET_TIMEOUT_MS")
        self._timeout = (int(env_ms) if env_ms else timeout_ms) / 1000.0

        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("", 0))
        self._srv.listen(world)
        port = self._srv.getsockname()[1]
        self._kv.key_value_set(f"{prefix}/addr/{rank}",
                               f"{host or _my_host()}:{port}")
        n_in = world - 1 - rank     # higher ranks dial me
        if n_in:
            threading.Thread(target=self._accept_loop, args=(n_in,),
                             daemon=True).start()
        for j in range(rank):       # I dial lower ranks
            addr = self._kv.blocking_key_value_get(
                f"{prefix}/addr/{j}", timeout_ms)
            h, p = addr.rsplit(":", 1)
            c = socket.create_connection((h, int(p)),
                                         timeout=self._timeout)
            c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            c.sendall(_HELLO.pack(rank))
            self._register(j, c)

    # --- wiring ------------------------------------------------------------
    def _accept_loop(self, n_in: int) -> None:
        for _ in range(n_in):
            c, _ = self._srv.accept()
            c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            peer = _HELLO.unpack(self._recv_exact(c, _HELLO.size))[0]
            self._register(int(peer), c)

    def _register(self, peer: int, conn: socket.socket) -> None:
        with self._cv:
            self._conns[peer] = conn
            self._wlocks[peer] = threading.Lock()
            self._cv.notify_all()
        threading.Thread(target=self._reader, args=(conn,),
                         daemon=True).start()

    @staticmethod
    def _recv_exact(conn: socket.socket, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("peer closed")
            buf.extend(chunk)
        return bytes(buf)

    def _reader(self, conn: socket.socket) -> None:
        try:
            while True:
                ln = _LEN.unpack(self._recv_exact(conn, _LEN.size))[0]
                tag, src, payload = pickle.loads(
                    self._recv_exact(conn, ln))
                with self._cv:
                    self._stash[(tag, src)] = payload
                    self._cv.notify_all()
        except (ConnectionError, OSError):
            return      # peer done (teardown)

    def _conn(self, dst: int) -> socket.socket:
        with self._cv:
            ok = self._cv.wait_for(lambda: dst in self._conns,
                                   timeout=self._timeout)
            assert ok, f"no connection to rank {dst}"
            return self._conns[dst]

    # --- tagged P2P ----------------------------------------------------------
    def send(self, dst: int, tag, payload) -> None:
        if dst == self.rank:
            with self._cv:
                self._stash[(tag, self.rank)] = payload
                self._cv.notify_all()
            return
        blob = pickle.dumps((tag, self.rank, payload),
                            protocol=pickle.HIGHEST_PROTOCOL)
        c = self._conn(dst)
        with self._wlocks[dst]:
            c.sendall(_LEN.pack(len(blob)) + blob)

    def recv(self, tag, src: int):
        key = (tag, src)
        with self._cv:
            ok = self._cv.wait_for(lambda: key in self._stash,
                                   timeout=self._timeout)
            if not ok:
                raise RuntimeError(
                    f"SocketGroup.recv: no message for {key} from rank "
                    f"{src} within {self._timeout:.0f} s — peer dead or "
                    f"stage slower than RAPTOR_TPU_NET_TIMEOUT_MS")
            return self._stash.pop(key)

    def close(self) -> None:
        for c in self._conns.values():
            try:
                c.close()
            except OSError:
                pass
        self._srv.close()
