"""Blocked (BSR) sharded device matrix.

Equivalent of the reference's ParBSRMatrix path (core/par_matrix.hpp:613,
BSR SpMV util/linalg/spmv.cpp:128): the matrix is partitioned over *block
rows*; halo exchange ships whole block-column vectors; the block product is
a batched small matmul (einsum over [W, RB, br, bc] blocks), which XLA maps
onto the VPU/MXU — the natural TPU layout for blocked operators.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from raptor_tpu.comm.plan import build_comm_plan
from raptor_tpu.core.matrix import BSRMatrix, CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.device import par as dpar

_BSR_DATA = ["on_cols", "on_blocks", "off_rows", "off_cols", "off_blocks",
             "send_idx", "send_mask", "halo_src", "slot_to_halo",
             "recv_mask", "row_mask"]
_BSR_META = ["b_rows", "b_cols", "brows_pad", "bcols_pad", "halo_pad",
             "slot", "global_num_rows", "global_num_cols"]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=_BSR_DATA, meta_fields=_BSR_META)
@dataclasses.dataclass
class DeviceParBSR:
    on_cols: jnp.ndarray     # [S, W_on, RB] int32 block col ids
    on_blocks: jnp.ndarray   # [S, W_on, RB, br, bc]
    # off block compacted to the BB boundary block rows (see par.py)
    off_rows: jnp.ndarray    # [S, BB] int32 block row ids (pad = RB)
    off_cols: jnp.ndarray    # [S, W_off, BB] int32 halo block ids
    off_blocks: jnp.ndarray  # [S, W_off, BB, br, bc]
    send_idx: jnp.ndarray    # [S, S, Q] int32 local block col ids
    send_mask: jnp.ndarray
    halo_src: jnp.ndarray    # [S, Hb]
    slot_to_halo: jnp.ndarray
    recv_mask: jnp.ndarray
    row_mask: jnp.ndarray    # [S, RB]
    b_rows: int
    b_cols: int
    brows_pad: int           # padded block rows per shard
    bcols_pad: int
    halo_pad: int
    slot: int
    global_num_rows: int     # scalar rows
    global_num_cols: int


def _block_ell(a: BSRMatrix, rb_pad: int, width: int):
    cols = np.zeros((width, rb_pad), dtype=np.int32)
    blocks = np.zeros((width, rb_pad, a.b_rows, a.b_cols))
    nbr = a.n_block_rows
    row_nnz = np.diff(a.indptr)
    if len(a.indices):
        rows = np.repeat(np.arange(nbr), row_nnz)
        pos = np.arange(len(a.indices)) - np.repeat(a.indptr[:-1], row_nnz)
        cols[pos, rows] = a.indices
        blocks[pos, rows] = a.blocks
    return cols, blocks


def device_put_bsr(a: ParCSRMatrix, b_rows: int, b_cols: int, mesh: Mesh,
                   dtype=jnp.float64) -> DeviceParBSR:
    """Build a blocked device matrix from a scalar ParCSRMatrix
    (to_ParBSR equivalent, core/par_matrix.cpp:872-997). The row partition
    is re-formed on block-row boundaries."""
    n, m = a.global_num_rows, a.global_num_cols
    assert n % b_rows == 0 and m % b_cols == 0
    S = a.partition.n_shards
    # block-level partition (contiguous block rows)
    bpart = Partition.create(n // b_rows, m // b_cols, S)
    part = Partition(n, m, S, bpart.row_bounds * b_rows,
                     bpart.col_bounds * b_cols)
    a = ParCSRMatrix(a.global_csr, part)

    # block-level sparsity pattern for the comm plan
    gb = a.global_csr.to_scipy().tobsr(blocksize=(b_rows, b_cols))
    import scipy.sparse as sp
    pat = sp.csr_matrix(
        (np.ones(len(gb.indices)), gb.indices, gb.indptr),
        shape=(n // b_rows, m // b_cols))
    bpat = ParCSRMatrix(CSRMatrix.from_scipy(pat), bpart)
    plan = build_comm_plan(bpat)
    shards = bpat.shards()

    RB = max(1, bpart.max_local_rows)
    W_on = max(1, max((int(np.diff(s.on_proc.indptr).max())
                       if s.on_proc.nnz else 0) for s in shards))
    W_off = max((int(np.diff(s.off_proc.indptr).max())
                 if s.off_proc.nnz else 0) for s in shards)
    BB = max(int(np.count_nonzero(np.diff(s.off_proc.indptr)))
             for s in shards)

    on_cols = np.zeros((S, W_on, RB), dtype=np.int32)
    on_blocks = np.zeros((S, W_on, RB, b_rows, b_cols))
    off_rows = np.full((S, BB), RB, dtype=np.int32)
    off_cols = np.zeros((S, W_off, BB), dtype=np.int32)
    off_blocks = np.zeros((S, W_off, BB, b_rows, b_cols))
    row_mask = np.zeros((S, RB))

    for s in range(S):
        r0, r1 = int(part.row_bounds[s]), int(part.row_bounds[s + 1])
        c0, c1 = int(part.col_bounds[s]), int(part.col_bounds[s + 1])
        rows = a.global_csr.to_scipy()[r0:r1].tobsr(
            blocksize=(b_rows, b_cols))
        bcols = rows.indices
        on_sel = ((bcols * b_cols >= c0) & (bcols * b_cols < c1))
        # on_proc block
        onb = BSRMatrix(r1 - r0, c1 - c0, b_rows, b_cols,
                        _reindptr(rows.indptr, on_sel),
                        bcols[on_sel] - c0 // b_cols,
                        np.asarray(rows.data)[on_sel])
        # off_proc block, condensed against the plan's halo column map
        cmap = shards[s].off_proc_column_map
        offb_cols = np.searchsorted(cmap, bcols[~on_sel])
        offb = BSRMatrix(r1 - r0, len(cmap) * b_cols, b_rows, b_cols,
                         _reindptr(rows.indptr, ~on_sel), offb_cols,
                         np.asarray(rows.data)[~on_sel])
        on_cols[s], on_blocks[s] = _block_ell(onb, RB, W_on)
        if BB:
            (off_rows[s, :], off_cols[s],
             off_blocks[s]) = _block_ell_boundary(offb, W_off, BB, RB)
        row_mask[s, :(r1 - r0) // b_rows] = 1.0

    put = lambda x, dt=None: dpar._shard_leading(x, mesh, dt)
    return DeviceParBSR(
        on_cols=put(on_cols), on_blocks=put(on_blocks, dtype),
        off_rows=put(off_rows),
        off_cols=put(off_cols), off_blocks=put(off_blocks, dtype),
        send_idx=put(plan.send_idx), send_mask=put(plan.send_mask, dtype),
        halo_src=put(plan.halo_src), slot_to_halo=put(plan.slot_to_halo),
        recv_mask=put(plan.recv_mask, dtype), row_mask=put(row_mask, dtype),
        b_rows=b_rows, b_cols=b_cols, brows_pad=RB,
        bcols_pad=max(1, bpart.max_local_cols), halo_pad=plan.halo_pad,
        slot=plan.slot, global_num_rows=n, global_num_cols=m)


def _block_ell_boundary(a: BSRMatrix, width: int, bb: int, rb_pad: int):
    """Boundary-compacted block ELL: only block rows with halo entries."""
    rows = np.full(bb, rb_pad, dtype=np.int32)
    cols = np.zeros((width, bb), dtype=np.int32)
    blocks = np.zeros((width, bb, a.b_rows, a.b_cols))
    row_nnz = np.diff(a.indptr)
    brows = np.nonzero(row_nnz)[0]
    if len(brows):
        rows[:len(brows)] = brows
        bn = row_nnz[brows]
        rpos = np.repeat(np.arange(len(brows)), bn)
        pos = np.arange(len(a.indices)) - np.repeat(a.indptr[brows], bn)
        cols[pos, rpos] = a.indices
        blocks[pos, rpos] = a.blocks
    return rows, cols, blocks


def _reindptr(indptr, sel):
    nrows = len(indptr) - 1
    rows = np.repeat(np.arange(nrows), np.diff(indptr))
    counts = np.bincount(rows[sel], minlength=nrows)
    out = np.zeros(len(indptr), dtype=np.int64)
    np.cumsum(counts, out=out[1:])
    return out


# --- shard-level kernels --------------------------------------------------------

def bsr_halo_exchange(A: DeviceParBSR, x2: jnp.ndarray) -> jnp.ndarray:
    """x2: [CB, bc] local block vectors -> halo [Hb, bc]."""
    send = x2[A.send_idx]      # [S, Q, bc]
    recv = jax.lax.all_to_all(send, dpar.ROW_AXIS, split_axis=0,
                              concat_axis=0, tiled=True)
    return recv.reshape(-1, A.b_cols)[A.halo_src]


def bsr_spmv_shard(A: DeviceParBSR, x: jnp.ndarray) -> jnp.ndarray:
    """b = A x; x [CB*bc] scalar layout -> b [RB*br]."""
    x2 = x.reshape(-1, A.b_cols)
    halo = bsr_halo_exchange(A, x2)
    # batched block matmul: blocks [W, RB, br, bc] x gathered [W, RB, bc]
    xon = x2[A.on_cols]                       # [W_on, RB, bc]
    b = jnp.einsum("wrij,wrj->ri", A.on_blocks, xon)
    if A.off_cols.shape[-1]:
        xoff = halo[A.off_cols]               # [W_off, BB, bc]
        contrib = jnp.einsum("wbij,wbj->bi", A.off_blocks, xoff)
        b = b.at[A.off_rows].add(contrib)     # OOB pads dropped
    return b.reshape(-1)


def bsr_spmv(mesh, A: DeviceParBSR, x):
    def body(A, x):
        A = jax.tree.map(lambda l: l[0], A)
        return bsr_spmv_shard(A, x[0])[None]

    ax = dpar._leading_axes(mesh)
    return jax.jit(lambda A, x: jax.shard_map(
        body, mesh=mesh, in_specs=dpar.leaf_specs((A, x)),
        out_specs=P(ax, None))(A, x))(A, x)
