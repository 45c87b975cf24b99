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

    @property
    def nnz(self) -> int:
        return self.on_proc.nnz + self.off_proc.nnz

    def global_cols_csr(self, n_global_cols: int) -> CSRMatrix:
        """This shard's rows as one CSR over GLOBAL column ids (the
        reference's init_par_mat_comm flattening, comm_mat.cpp:57-92) —
        the wire format for matrix-row communication. Cached."""
        cached = getattr(self, "_gcols_csr", None)
        if cached is not None and cached.n_cols == n_global_cols:
            return cached
        on, off = self.on_proc, self.off_proc
        c0 = self.first_local_col
        cmap = np.asarray(self.off_proc_column_map)
        rows = np.concatenate([on.row_ids(), off.row_ids()])
        cols = np.concatenate([on.indices.astype(np.int64) + c0,
                               cmap[off.indices] if off.nnz
                               else np.zeros(0, dtype=np.int64)])
        vals = np.concatenate([on.data, off.data])
        import scipy.sparse as sp
        g = sp.csr_matrix((vals, (rows, cols)),
                          shape=(on.n_rows, n_global_cols))
        g.sort_indices()
        self._gcols_csr = CSRMatrix.from_scipy(g)
        return self._gcols_csr


def shard_from_local_rows(local: CSRMatrix, first_row: int,
                          c0: int, c1: int) -> ShardBlocks:
    """Build one shard's (on_proc, off_proc) split from its local row
    block stored with GLOBAL column ids (finalize()/condense_off_proc,
    par_matrix.cpp:79-162) — the SPMD constructor: a rank builds its
    ShardBlocks from only its own rows, no global matrix anywhere."""
    import scipy.sparse as sp
    coo = local.to_scipy().tocoo()
    on_sel = (coo.col >= c0) & (coo.col < c1)
    on = sp.csr_matrix(
        (coo.data[on_sel], (coo.row[on_sel], coo.col[on_sel] - c0)),
        shape=(local.n_rows, c1 - c0))
    on.sum_duplicates()
    on.sort_indices()
    off_sel = ~on_sel
    off_gcols = coo.col[off_sel]
    col_map = np.unique(off_gcols)
    cond = np.searchsorted(col_map, off_gcols)
    off = sp.csr_matrix(
        (coo.data[off_sel], (coo.row[off_sel], cond)),
        shape=(local.n_rows, len(col_map)))
    off.sum_duplicates()
    off.sort_indices()
    return ShardBlocks(
        on_proc=CSRMatrix.from_scipy(on),
        off_proc=CSRMatrix.from_scipy(off),
        off_proc_column_map=col_map.astype(np.int64),
        first_local_row=int(first_row),
        first_local_col=int(c0))


class ParCSRMatrix:
    """1-D row-partitioned matrix over ``n_shards``.

    Two storage modes:
    - in-process (``__init__``): the global CSR is canonical and the
      per-shard on/off blocks are derived views — convenient when one
      host drives every shard (tests, host-global setup oracle);
    - local view (``from_shard_blocks`` / ``from_local_rows``): ONLY the
      shards owned by this process exist; the global matrix is never
      materialized (the reference's actual data model,
      core/par_matrix.hpp:78-343 — each rank holds its row block).
      Global-matrix methods raise; distributed setup goes through
      ``raptor_tpu.comm.transport`` instead.
    """

    def __init__(self, global_csr: CSRMatrix, partition: Partition):
        assert global_csr.n_rows == partition.global_num_rows
        assert global_csr.n_cols == partition.global_num_cols
        self.global_csr = global_csr
        self.partition = partition
        self.first_shard = 0
        self._shards: Optional[List[ShardBlocks]] = None

    @classmethod
    def from_shard_blocks(cls, blocks: List[ShardBlocks],
                          partition: Partition,
                          first_shard: int = 0) -> "ParCSRMatrix":
        """Local view from this process's shard blocks (a contiguous
        shard range starting at ``first_shard``). No global CSR exists."""
        self = cls.__new__(cls)
        self.global_csr = None
        self.partition = partition
        self.first_shard = int(first_shard)
        self._shards = list(blocks)
        return self

    @classmethod
    def from_local_rows(cls, local_rows: List[CSRMatrix],
                        partition: Partition,
                        first_shard: int = 0) -> "ParCSRMatrix":
        """Local view from per-shard row blocks stored with GLOBAL
        column ids (what matrix-row communication and SPMD assembly
        produce)."""
        blocks = []
        for i, loc in enumerate(local_rows):
            s = first_shard + i
            blocks.append(shard_from_local_rows(
                loc, int(partition.row_bounds[s]),
                int(partition.col_bounds[s]),
                int(partition.col_bounds[s + 1])))
        return cls.from_shard_blocks(blocks, partition, first_shard)

    @property
    def is_local_view(self) -> bool:
        return self.global_csr is None

    def _g(self) -> CSRMatrix:
        if self.global_csr is None:
            raise RuntimeError(
                "local-view ParCSRMatrix: the global matrix does not "
                "exist on this process; use the shard blocks + "
                "comm.transport primitives (or assemble_global() when "
                "every shard is local)")
        return self.global_csr

    def assemble_global(self) -> CSRMatrix:
        """Concatenate all-local shard blocks into one global CSR (only
        valid when this view holds every shard — test/oracle use)."""
        if self.global_csr is not None:
            return self.global_csr
        assert self.first_shard == 0 and \
            len(self._shards) == self.partition.n_shards, \
            "assemble_global needs every shard local"
        import scipy.sparse as sp
        n_cols = self.partition.global_num_cols
        g = sp.vstack([blk.global_cols_csr(n_cols).to_scipy()
                       for blk in self._shards]).tocsr()
        g.sort_indices()
        return CSRMatrix.from_scipy(g)

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
        return self._g().nnz

    @property
    def local_nnz(self) -> int:
        """nnz of the shards held by this process."""
        return sum(blk.nnz for blk in self.shards())

    def copy(self) -> "ParCSRMatrix":
        if self.global_csr is None:
            return ParCSRMatrix.from_shard_blocks(
                list(self._shards), self.partition, self.first_shard)
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
            rows = self._g().row_slice(int(r0), int(r1))
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
        return self._g().mult(x)

    def mult_T(self, x: np.ndarray) -> np.ndarray:
        """b = A^T x (par_spmv.cpp:157-209)."""
        return self._g().mult_T(x)

    def residual(self, x: np.ndarray, b: np.ndarray) -> np.ndarray:
        return self._g().residual(x, b)

    def multiply(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        """C = A B (par_matmult.cpp:79-113); result inherits A's row
        partition and B's col partition (init_matrix, par_matmult.cpp:45-77)."""
        c = self._g().multiply(other._g())
        return ParCSRMatrix(c, self.partition.product(other.partition))

    def mult_T_mat(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        """C = self^T @ other (AP->mult_T(P) trick, par_matmult.cpp:163).
        Native transpose-SpGEMM — canonical output, no explicit A^T."""
        c = self._g().T_multiply(other._g())
        return ParCSRMatrix(
            c, self.partition.transpose().product(other.partition))

    def transpose(self) -> "ParCSRMatrix":
        """Distributed transpose (par_matrix.cpp:694-858)."""
        return ParCSRMatrix(self._g().transpose(),
                            self.partition.transpose())

    def add(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        return ParCSRMatrix(self._g().add(other._g()),
                            self.partition)

    def subtract(self, other: "ParCSRMatrix") -> "ParCSRMatrix":
        return ParCSRMatrix(self._g().subtract(other._g()),
                            self.partition)

    def diagonal(self) -> np.ndarray:
        return self._g().diagonal()


def par_matrix_from_scipy(m, n_shards: int) -> ParCSRMatrix:
    csr = CSRMatrix.from_scipy(m)
    return ParCSRMatrix(
        csr, Partition.create(csr.n_rows, csr.n_cols, n_shards))

class ParCOOMatrix:
    """Row-partitioned COO (core/par_matrix.hpp:345-423): the assembly
    format — add_value/add_global_value accumulate triplets, finalize
    converts to ParCSR (finalize(), par_matrix.cpp:114-162)."""

    def __init__(self, partition: Partition):
        self.partition = partition
        self._rows: List[int] = []
        self._cols: List[int] = []
        self._vals: List[float] = []

    def add_global_value(self, row: int, col: int, val: float) -> None:
        self._rows.append(row)
        self._cols.append(col)
        self._vals.append(val)

    def add_values(self, rows, cols, vals) -> None:
        self._rows.extend(np.asarray(rows).tolist())
        self._cols.extend(np.asarray(cols).tolist())
        self._vals.extend(np.asarray(vals).tolist())

    def finalize(self) -> "ParCSRMatrix":
        import scipy.sparse as sp
        part = self.partition
        g = sp.csr_matrix(
            (self._vals, (self._rows, self._cols)),
            shape=(part.global_num_rows, part.global_num_cols))
        g.sum_duplicates()
        g.sort_indices()
        return ParCSRMatrix(CSRMatrix.from_scipy(g), part)


class ParCSCMatrix:
    """Column-compressed view of a row-partitioned matrix
    (core/par_matrix.hpp:701-790). Setup-phase only, like the serial
    CSCMatrix: the reference uses it for column-driven passes
    (CF-splitting transposes, distributed transpose).

    Works on BOTH storage modes of ParCSRMatrix: in-process (one global
    CSC) and local view (per-LOCAL-shard CSC blocks with global column
    ids — each rank compresses only its own row block, like the
    reference's per-rank on/off CSC)."""

    def __init__(self, par_csr: "ParCSRMatrix"):
        from raptor_tpu.core.matrix import CSCMatrix
        self.partition = par_csr.partition
        self.par_csr = par_csr
        if par_csr.is_local_view:
            self.csc = None
            G = self.partition.global_num_cols
            self._local_cscs = [
                CSCMatrix.from_csr(blk.global_cols_csr(G))
                for blk in par_csr.shards()]
        else:
            self.csc = CSCMatrix.from_csr(par_csr._g())
            self._local_cscs = None

    def local_csc(self, i: int):
        """The i-th LOCAL shard's rows as a CSC block (global rows via
        ``first_shard + i``; columns global)."""
        if self._local_cscs is not None:
            return self._local_cscs[i]
        from raptor_tpu.core.matrix import CSCMatrix
        part = self.partition
        s = self.par_csr.first_shard + i
        G = part.global_num_cols
        return CSCMatrix.from_csr(
            self.par_csr.shards()[i].global_cols_csr(G))

    def to_par_csr(self) -> "ParCSRMatrix":
        if self.csc is None:
            return ParCSRMatrix.from_local_rows(
                [c.to_csr() for c in self._local_cscs], self.partition,
                first_shard=self.par_csr.first_shard)
        return ParCSRMatrix(self.csc.to_csr(), self.partition)

    def transpose(self, tr=None) -> "ParCSRMatrix":
        """A^T, row-partitioned by A's columns. Local view: the
        distributed transpose over the Transport seam (no global matrix
        on any rank, core/par_matrix.cpp:694-858)."""
        if self.csc is None:
            from raptor_tpu.ruge_stuben.par_setup import dist_transpose
            t_blocks = dist_transpose(self.par_csr, tr, assemble=False)
            return ParCSRMatrix.from_local_rows(
                t_blocks, self.partition.transpose(),
                first_shard=self.par_csr.first_shard)
        return ParCSRMatrix(self.csc.transpose(),
                            self.partition.transpose())


class ParBSRMatrix:
    """Row-partitioned blocked matrix (core/par_matrix.hpp:613-699):
    a scalar ParCSR re-partitioned on block boundaries + the block size.
    ``to_device`` is the CSR->BSR redistribution + block-ELL packing
    (par_matrix.cpp:872-997 ≡ device/bsr.py device_put_bsr);
    ``hierarchy`` builds the blocked AMG solver."""

    def __init__(self, par_csr: "ParCSRMatrix", b_rows: int,
                 b_cols: int = None, tr=None):
        b_cols = b_cols or b_rows
        assert par_csr.global_num_rows % b_rows == 0
        assert par_csr.global_num_cols % b_cols == 0
        self.b_rows, self.b_cols = int(b_rows), int(b_cols)
        from raptor_tpu.multilevel.bsr_hierarchy import block_partition
        part = block_partition(par_csr.global_num_rows,
                               par_csr.global_num_cols, b_rows,
                               par_csr.partition.n_shards)
        if par_csr.is_local_view:
            # CSR->BSR redistribution over the Transport seam
            # (par_matrix.cpp:872-997): rows move to their block-aligned
            # owners via the row-routed reduction; no rank ever holds
            # the global matrix.
            from raptor_tpu.comm.transport import InProcessTransport
            tr = tr or InProcessTransport(par_csr)
            triplets = []
            G = part.global_num_cols
            for blk in par_csr.shards():
                g = blk.global_cols_csr(G)
                rows = g.row_ids() + blk.first_local_row
                triplets.append((rows.astype(np.int64),
                                 g.indices.copy(), g.data))
            blocks = tr.reduce_rows(triplets, part.row_bounds, G)
            self.par_csr = ParCSRMatrix.from_local_rows(
                blocks, part, first_shard=getattr(tr, "first_shard",
                                                  par_csr.first_shard))
        else:
            self.par_csr = ParCSRMatrix(par_csr._g(), part)

    @property
    def partition(self) -> Partition:
        return self.par_csr.partition

    @property
    def global_num_rows(self) -> int:
        return self.par_csr.global_num_rows

    def local_bsr(self, s: int):
        """Shard s's rows as a serial BSRMatrix (global block cols).
        Works on both storage modes: a local view converts only its own
        row block (``s`` counts from ``first_shard``)."""
        from raptor_tpu.core.matrix import BSRMatrix
        part = self.par_csr.partition
        r0 = int(part.row_bounds[s])
        r1 = int(part.row_bounds[s + 1])
        G = self.par_csr.global_num_cols
        if self.par_csr.is_local_view:
            blk = self.par_csr.shards()[s - self.par_csr.first_shard]
            g = blk.global_cols_csr(G).to_scipy()
        else:
            g = self.par_csr._g().to_scipy()[r0:r1]
        gb = g.tobsr(blocksize=(self.b_rows, self.b_cols))
        return BSRMatrix(r1 - r0, G,
                         self.b_rows, self.b_cols,
                         gb.indptr.astype(np.int64),
                         gb.indices.astype(np.int64),
                         np.asarray(gb.data))

    def to_device(self, mesh, dtype=None):
        import jax.numpy as jnp
        from raptor_tpu.device.bsr import device_put_bsr
        return device_put_bsr(self.par_csr, self.b_rows, self.b_cols,
                              mesh, dtype=dtype or jnp.float64)

    def mult(self, x: np.ndarray) -> np.ndarray:
        return self.par_csr.mult(x)


class ParBCOOMatrix:
    """Row-partitioned blocked COO (core/par_matrix.hpp:424): the
    blocked ASSEMBLY container — ``add_block`` accumulates b_rows x
    b_cols dense blocks at global block coordinates, ``finalize``
    sums duplicates and converts to ParBSR (add_value block path,
    par_matrix.cpp:26-78 + finalize :114-162)."""

    def __init__(self, partition: Partition, b_rows: int,
                 b_cols: int = None):
        b_cols = b_cols or b_rows
        assert partition.global_num_rows % b_rows == 0
        assert partition.global_num_cols % b_cols == 0
        self.partition = partition
        self.b_rows, self.b_cols = int(b_rows), int(b_cols)
        self._rows: List[int] = []   # global block rows
        self._cols: List[int] = []   # global block cols
        self._blocks: List[np.ndarray] = []

    def add_block(self, brow: int, bcol: int, block) -> None:
        block = np.asarray(block, dtype=np.float64)
        assert block.shape == (self.b_rows, self.b_cols)
        self._rows.append(int(brow))
        self._cols.append(int(bcol))
        self._blocks.append(block)

    def finalize(self) -> "ParBSRMatrix":
        import scipy.sparse as sp
        from raptor_tpu.core.matrix import BCOOMatrix
        part = self.partition
        coo = BCOOMatrix(part.global_num_rows, part.global_num_cols,
                         self.b_rows, self.b_cols,
                         np.asarray(self._rows, dtype=np.int64),
                         np.asarray(self._cols, dtype=np.int64),
                         np.asarray(self._blocks, dtype=np.float64)
                         if self._blocks else
                         np.zeros((0, self.b_rows, self.b_cols)))
        g = coo.to_bsr().to_scipy().tocsr()
        g.sum_duplicates()
        g.sort_indices()
        return ParBSRMatrix(
            ParCSRMatrix(CSRMatrix.from_scipy(g), part), self.b_rows,
            self.b_cols)


class ParBSCMatrix:
    """Blocked column-compressed view of a row-partitioned blocked
    matrix (core/par_matrix.hpp:792): per-shard BSC blocks for
    column-driven setup passes, mirroring ParCSCMatrix at the block
    level."""

    def __init__(self, par_bsr: "ParBSRMatrix"):
        self.par_bsr = par_bsr
        self.partition = par_bsr.partition

    def local_bsc(self, s: int):
        """Shard s's rows as a serial BSCMatrix (global block cols)."""
        from raptor_tpu.core.matrix import BSCMatrix
        return BSCMatrix.from_bsr(self.par_bsr.local_bsr(s))

    def to_par_bsr(self) -> "ParBSRMatrix":
        return self.par_bsr
