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

    def fetch_ids(self, local_vals: List[np.ndarray],
                  wanted_ids: List[np.ndarray]) -> List[np.ndarray]:
        """Fetch values for ARBITRARY global ids (distance-2 fringe data;
        the reference builds one-off comm patterns for this, e.g.
        par_mis.cpp comm_coarse_dist1)."""
        glob = np.concatenate(local_vals) if self.S > 1 else local_vals[0]
        return [glob[np.asarray(ids, dtype=np.int64)]
                if len(ids) else np.zeros(0, dtype=glob.dtype)
                for ids in wanted_ids]

    def exscan_sum(self, local_scalars: List[float]) -> List[float]:
        """Exclusive prefix sum over shards (MPI_Exscan): shard s gets the
        sum of shards < s. Used for global coarse-index numbering."""
        c = np.concatenate(([0.0], np.cumsum(local_scalars)[:-1]))
        return [float(v) for v in c]

    def reduce_rows(self, triplets: List, row_bounds: np.ndarray,
                    n_rows: int, n_cols: int):
        """Transpose matrix communication (comm_mat.cpp:209-346): each
        shard contributes partial rows as (rows, cols, vals) COO with
        GLOBAL ids; contributions are summed at the row owners. Returns
        the assembled global CSR (in-process; an MPI implementation
        returns only the local row block)."""
        import scipy.sparse as sp
        from raptor_tpu.core.matrix import CSRMatrix
        rs = np.concatenate([t[0] for t in triplets])
        cs = np.concatenate([t[1] for t in triplets])
        vs = np.concatenate([t[2] for t in triplets])
        g = sp.csr_matrix((vs, (rs, cs)), shape=(n_rows, n_cols))
        g.sum_duplicates()
        g.sort_indices()
        return CSRMatrix.from_scipy(g)

    def fetch_rows(self, a, wanted: List[np.ndarray]):
        """Matrix-row communication (core/comm_mat.cpp:53-150): shard s
        receives the GLOBAL-column CSR rows listed in ``wanted[s]``
        (global row ids, owned by other shards). ``a`` is a CSRMatrix
        (global-column form) or ParCSRMatrix. Returns per-shard
        (indptr, global_cols, vals)."""
        g = getattr(a, "global_csr", a)  # in-process shortcut; MPI packs rows
        out = []
        for rows in wanted:
            rows = np.asarray(rows, dtype=np.int64)
            counts = np.diff(g.indptr)[rows] if len(rows) else \
                np.zeros(0, dtype=np.int64)
            indptr = np.concatenate(([0], np.cumsum(counts)))
            idx = (np.concatenate([
                np.arange(g.indptr[r], g.indptr[r + 1]) for r in rows])
                if len(rows) and indptr[-1] else np.zeros(0, dtype=np.int64))
            out.append((indptr.astype(np.int64),
                        g.indices[idx], g.data[idx]))
        return out
