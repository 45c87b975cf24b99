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


def partition_graph(a: ParCSRMatrix, n_parts: int = None) -> np.ndarray:
    """Bandwidth-reducing partitioner: reverse Cuthill-McKee ordering cut
    into equal contiguous blocks. Stands in for ParMETIS_V3_PartKway /
    SCOTCH_dgraphPart in the reference's optional externals — same call
    shape (matrix -> row->part assignment), no external dependency."""
    n_parts = n_parts or a.partition.n_shards
    m = a.global_csr.to_scipy()
    sym = (m + m.T).tocsr()
    order = csgraph.reverse_cuthill_mckee(sym, symmetric_mode=True)
    n = a.global_num_rows
    proc = np.zeros(n, dtype=np.int64)
    bounds = np.linspace(0, n, n_parts + 1).astype(np.int64)
    for p in range(n_parts):
        proc[order[bounds[p]:bounds[p + 1]]] = p
    return proc
