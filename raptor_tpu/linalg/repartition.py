"""Repartitioning / row migration (util/linalg/repartition.cpp:6,64) and a
built-in graph partitioner standing in for the reference's ParMETIS /
PT-Scotch wrappers (util/linalg/external/parmetis_wrapper.hpp:12,
ptscotch_wrapper.hpp:17)."""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.csgraph as csgraph

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition


def make_contiguous(a: ParCSRMatrix, proc_of_row: np.ndarray):
    """Relabel rows/cols so each shard's rows are contiguous in shard order
    (make_contiguous, repartition.cpp:6). Returns (A_new, perm) with
    ``perm[new_global] = old_global``."""
    proc_of_row = np.asarray(proc_of_row)
    S = a.partition.n_shards
    perm = np.argsort(proc_of_row, kind="stable")
    counts = np.bincount(proc_of_row, minlength=S)
    bounds = np.zeros(S + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    m = a.global_csr.to_scipy()[perm][:, perm].tocsr()
    m.sort_indices()
    part = Partition(a.global_num_rows, a.global_num_cols, S, bounds, bounds)
    return ParCSRMatrix(CSRMatrix.from_scipy(m), part), perm


def repartition_matrix(a: ParCSRMatrix, proc_of_row: np.ndarray):
    """Apply an arbitrary row->shard assignment (repartition_matrix,
    repartition.cpp:64)."""
    return make_contiguous(a, proc_of_row)


def partition_graph(a: ParCSRMatrix, n_parts: int = None,
                    method: str = "kway") -> np.ndarray:
    """Quality graph partitioner standing in for ParMETIS_V3_PartKway /
    SCOTCH_dgraphPart (same call shape: matrix -> row->part assignment,
    no external dependency).

    ``method="kway"`` (default): native multilevel k-way — heavy-edge
    matching coarsening, greedy growing, boundary FM refinement
    (csrc/setup_kernels.cpp: partition_kway) on the symmetrized
    |A| + |A^T| adjacency with absolute-value edge weights. Falls back
    to RCM when the native library is unavailable.
    ``method="rcm"``: reverse Cuthill-McKee banding cut into equal
    contiguous blocks (the round-2 partitioner; cheap, bandwidth-only).
    """
    n_parts = n_parts or a.partition.n_shards
    n = a.global_num_rows
    m = a.global_csr.to_scipy()
    abs_m = abs(m)
    sym = (abs_m + abs_m.T).tocsr()
    if method == "kway":
        from raptor_tpu import native
        if native.available():
            sym.setdiag(0)
            sym.eliminate_zeros()
            sym.sort_indices()
            part, _ = native.partition_kway(
                sym.indptr, sym.indices, sym.data, n, n_parts)
            return part
    order = csgraph.reverse_cuthill_mckee(sym, symmetric_mode=True)
    proc = np.zeros(n, dtype=np.int64)
    bounds = np.linspace(0, n, n_parts + 1).astype(np.int64)
    for p in range(n_parts):
        proc[order[bounds[p]:bounds[p + 1]]] = p
    return proc


def comm_volume(a: ParCSRMatrix, proc_of_row: np.ndarray) -> dict:
    """Halo statistics of a row->part assignment on A's pattern: the
    communication the partition would induce (what ParMETIS minimizes).

    - ``edge_cut``: nnz whose row and column live on different parts.
    - ``halo_values``: distinct (column, requesting part) pairs — the
      values actually fetched per SpMV (each column sent once per
      requesting part, the CommPlan dedup).
    - ``max_part_rows``: balance check.
    """
    proc = np.asarray(proc_of_row)
    m = a.global_csr.to_scipy().tocoo()
    rp, cp = proc[m.row], proc[m.col]
    cut = int((rp != cp).sum())
    pairs = np.unique(np.stack([m.col[rp != cp], rp[rp != cp]]), axis=1)
    return {
        "edge_cut": cut,
        "halo_values": int(pairs.shape[1]),
        "max_part_rows": int(np.bincount(proc).max()),
    }
