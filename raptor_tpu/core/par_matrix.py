"""Row-partitioned distributed matrix (host-side description).

Equivalent of the reference's ``ParCSRMatrix`` (core/par_matrix.hpp:78-849):
each shard owns a contiguous block of rows split into an ``on_proc`` block
(columns owned by the shard) and a condensed ``off_proc`` halo block with an
``off_proc_column_map`` of global column ids (par_matrix.hpp:313-343,
``condense_off_proc`` par_matrix.cpp:79-112).

TPU-first difference: because the host drives all shards, the canonical
storage is the *global* CSR + a ``Partition``; the per-shard on/off blocks are
derived views (computed once, cached). The solve phase never sees this class —
it sees the static padded plan built by ``raptor_tpu.device.par``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.partition import Partition


@dataclasses.dataclass
class ShardBlocks:
    """One shard's row block, split like the reference ParMatrix."""

    on_proc: CSRMatrix              # local rows x local cols
    off_proc: CSRMatrix             # local rows x n_halo (condensed)
    off_proc_column_map: np.ndarray  # [n_halo] global col ids, sorted
    first_local_row: int
    first_local_col: int

    @property
    def local_num_rows(self) -> int:
        return self.on_proc.n_rows

    @property
    def on_proc_num_cols(self) -> int:
        return self.on_proc.n_cols


class ParCSRMatrix:
    """Global CSR + 1-D row partition over ``n_shards``."""

    def __init__(self, global_csr: CSRMatrix, partition: Partition):
        assert global_csr.n_rows == partition.global_num_rows
        assert global_csr.n_cols == partition.global_num_cols
        self.global_csr = global_csr
        self.partition = partition
        self._shards: Optional[List[ShardBlocks]] = None

    # --- properties mirroring the reference API ------------------------------
    @property
    def global_num_rows(self) -> int:
        return self.partition.global_num_rows

    @property
    def global_num_cols(self) -> int:
        return self.partition.global_num_cols

    @property
    def n_shards(self) -> int:
        return self.partition.n_shards

    @property
    def nnz(self) -> int:
        return self.global_csr.nnz

    def copy(self) -> "ParCSRMatrix":
        return ParCSRMatrix(self.global_csr.copy(), self.partition)

    # --- shard views ----------------------------------------------------------
    def shards(self) -> List[ShardBlocks]:
        """Split into per-shard (on_proc, off_proc) blocks with condensed halo
        column maps (finalize()/condense_off_proc semantics,
        par_matrix.cpp:79-162)."""
        if self._shards is not None:
            return self._shards
        out = []
        part = self.partition
        for s in range(part.n_shards):
            r0, r1 = part.row_bounds[s], part.row_bounds[s + 1]
            c0, c1 = part.col_bounds[s], part.col_bounds[s + 1]
            rows = self.global_csr.row_slice(int(r0), int(r1))
            on_mask_csr = rows.col_slice(int(c0), int(c1))
            # off_proc: all cols outside [c0, c1), condensed
            rows_sp = rows.to_scipy().tocoo()
            off_sel = (rows_sp.col < c0) | (rows_sp.col >= c1)
            off_rows = rows_sp.row[off_sel]
            off_gcols = rows_sp.col[off_sel]
            off_vals = rows_sp.data[off_sel]
            col_map = np.unique(off_gcols)
            cond = np.searchsorted(col_map, off_gcols)
            import scipy.sparse as sp
            off = sp.csr_matrix(
                (off_vals, (off_rows, cond)),
                shape=(int(r1 - r0), len(col_map)))
            off.sum_duplicates()
            off.sort_indices()
            out.append(ShardBlocks(
                on_proc=on_mask_csr.canonicalize(),
                off_proc=CSRMatrix.from_scipy(off),
                off_proc_column_map=col_map.astype(np.int64),
                first_local_row=int(r0),
                first_local_col=int(c0),
            ))
        self._shards = out
        return out

    # --- host reference linear algebra ---------------------------------------
    def mult(self, x: np.ndarray) -> np.ndarray:
        """b = A x (par_spmv.cpp:25-59)."""
        return self.global_csr.mult(x)

    def mult_T(self, x: np.ndarray) -> np.ndarray:
        """b = A^T x (par_spmv.cpp:157-209)."""
        return self.global_csr.mult_T(x)

    def residual(self, x: np.ndarray, b: np.ndarray) -> np.ndarray:
        return self.global_csr.residual(x, b)

    def multiply(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        """C = A B (par_matmult.cpp:79-113); result inherits A's row
        partition and B's col partition (init_matrix, par_matmult.cpp:45-77)."""
        c = self.global_csr.multiply(other.global_csr)
        return ParCSRMatrix(c, self.partition.product(other.partition))

    def mult_T_mat(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        """C = self^T @ other (AP->mult_T(P) trick, par_matmult.cpp:163)."""
        c = CSRMatrix.from_scipy(
            (self.global_csr.to_scipy().T @ other.global_csr.to_scipy())
            .tocsr())
        c = c.canonicalize(drop_tol=None).drop()
        return ParCSRMatrix(
            c, self.partition.transpose().product(other.partition))

    def transpose(self) -> "ParCSRMatrix":
        """Distributed transpose (par_matrix.cpp:694-858)."""
        return ParCSRMatrix(self.global_csr.transpose(),
                            self.partition.transpose())

    def add(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        return ParCSRMatrix(self.global_csr.add(other.global_csr),
                            self.partition)

    def subtract(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        return ParCSRMatrix(self.global_csr.subtract(other.global_csr),
                            self.partition)

    def diagonal(self) -> np.ndarray:
        return self.global_csr.diagonal()


def par_matrix_from_scipy(m, n_shards: int) -> ParCSRMatrix:
    csr = CSRMatrix.from_scipy(m)
    return ParCSRMatrix(
        csr, Partition.create(csr.n_rows, csr.n_cols, n_shards))
