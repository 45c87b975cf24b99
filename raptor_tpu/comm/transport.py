"""Shard-level setup-phase transport: the distributed-memory seam.

The reference's AMG setup runs distributed over MPI (par_strength.cpp,
par_cf_splitting.cpp, ...): every rank owns its row block and exchanges
halo values / transpose reductions with neighbors. This module is the
same seam for the TPU build's host-side setup: setup algorithms in
``ruge_stuben.par_setup`` operate ONLY on per-shard blocks plus these
three primitives:

- ``fetch(locals)``   — forward halo exchange: values of my off_proc
                        columns, fetched from their owners
                        (ParComm::communicate, core/comm_pkg.hpp:631-652)
- ``reduce(halos)``   — transpose exchange: my contributions to remote
                        columns, combined at their owners with add/max
                        (ParComm::communicate_T, core/comm_pkg.hpp:756-800)
- ``allreduce_sum``   — global scalar reduction (RAPtor_MPI_Allreduce)

``InProcessTransport`` implements them over in-process NumPy (all shards
live in one host), which is exact and deterministic; a multi-host
implementation (jax.distributed / MPI) plugs in behind the same calls
without touching the algorithms.
"""

from __future__ import annotations

from typing import List

import numpy as np

from raptor_tpu.core.par_matrix import ParCSRMatrix


class InProcessTransport:
    def __init__(self, a: ParCSRMatrix):
        part = a.partition
        self.S = part.n_shards
        self.col_bounds = np.asarray(part.col_bounds)
        self.n_cols_total = int(part.global_num_cols)
        # off_proc col maps hold GLOBAL column ids
        self.maps = [np.asarray(blk.off_proc_column_map)
                     for blk in a.shards()]

    # --- forward: owners -> requesters -----------------------------------
    def fetch(self, local_vals: List[np.ndarray]) -> List[np.ndarray]:
        """Per-shard values of the off_proc columns (owned elsewhere)."""
        glob = np.concatenate(local_vals) if self.S > 1 else local_vals[0]
        return [glob[m] for m in self.maps]

    # --- transpose: requesters -> owners ----------------------------------
    def reduce(self, halo_vals: List[np.ndarray], op: str = "add",
               init: float = 0.0) -> List[np.ndarray]:
        """Combine per-shard halo contributions at the owning shard.
        Returns per-shard arrays over LOCAL columns."""
        glob = np.full(self.n_cols_total, init, dtype=np.float64)
        ufunc = {"add": np.add, "max": np.maximum}[op]
        for contrib, m in zip(halo_vals, self.maps):
            if len(m):
                ufunc.at(glob, m, contrib)
        b = self.col_bounds
        return [glob[int(b[s]):int(b[s + 1])] for s in range(self.S)]

    # --- collectives -------------------------------------------------------
    def allreduce_sum(self, local_scalars: List[float]) -> float:
        return float(np.sum(local_scalars))
