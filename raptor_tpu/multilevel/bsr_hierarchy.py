"""Blocked (BSR) AMG: nodal hierarchy + block-ELL device solve.

The reference's ParBSR path (core/par_matrix.hpp:613-699, CSR->BSR
redistribution par_matrix.cpp:872-997, blocked SpMV spmv.cpp:128) treats
a system with ``b`` dofs per node as a matrix of b x b dense blocks.
The AMG analog here is NODAL coarsening (the standard blocked-systems
recipe): condense each b x b block to its Frobenius norm, make the nodal
graph an M-matrix (positive diagonal, negative off-diagonals), run the
scalar classical pipeline (strength -> CF split -> interpolation) on it,
and expand the nodal prolongator blockwise, P = P_n (x) I_b, so every
level's operator keeps exact b x b block structure.

Device side: each level's operator is a block-ELL DeviceParBSR (batched
b x b matmuls on the VPU/MXU, device/bsr.py), smoothing is damped BLOCK
Jacobi (batched inverse-diagonal-block multiply), and the transfer
operators act per component through the scalar nodal device matrices.
The whole solve iteration runs in one shard_map while_loop like the
scalar hierarchy. ``precond_pack`` makes the blocked V-cycle a
preconditioner for the scalar Krylov drivers (PCG on BSR operators —
BASELINE config 5).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.core.types import (CoarsenType, InterpType, RelaxType,
                                   StrengthType)
from raptor_tpu.device import par as dpar
from raptor_tpu.device.bsr import DeviceParBSR, bsr_spmv_shard, device_put_bsr
from raptor_tpu.device.par import dot_shard, spmv_shard, spmv_T_shard
from raptor_tpu.multilevel.level import Level
from raptor_tpu.multilevel.par_multilevel import (ParMultilevel,
                                                  ParRugeStubenSolver)


def nodal_matrix(a: CSRMatrix, b: int, first_node: int = 0) -> CSRMatrix:
    """Condense b x b blocks to an M-matrix nodal graph: diagonal block
    -> +||B||_F, off-diagonal -> -||B||_F (the blocked-systems strength
    convention; the scalar classical pipeline then applies unchanged).

    ``first_node``: global node id of row 0 — for shard row blocks whose
    columns are global, the diagonal block of local row i sits at global
    column first_node + i."""
    assert a.n_rows % b == 0 and a.n_cols % b == 0
    gb = a.to_scipy().tobsr(blocksize=(b, b))
    norms = np.sqrt((np.asarray(gb.data) ** 2).sum(axis=(1, 2)))
    nb = a.n_rows // b
    rows = np.repeat(np.arange(nb), np.diff(gb.indptr))
    sign = np.where(gb.indices == rows + first_node, 1.0, -1.0)
    m = sp.csr_matrix((norms * sign, gb.indices, gb.indptr),
                      shape=(nb, a.n_cols // b))
    m.sort_indices()
    return CSRMatrix.from_scipy(m)


def expand_prolongator(p_nodal: CSRMatrix, b: int) -> CSRMatrix:
    """P = P_n (x) I_b (block-diagonal expansion, scalar CSR)."""
    pk = sp.kron(p_nodal.to_scipy(), sp.identity(b, format="csr"),
                 format="csr")
    pk.sort_indices()
    return CSRMatrix.from_scipy(pk)


def block_partition(n_scalar: int, m_scalar: int, b: int,
                    n_shards: int) -> Partition:
    """Scalar partition whose bounds land on block boundaries."""
    bpart = Partition.create(n_scalar // b, m_scalar // b, n_shards)
    return Partition(n_scalar, m_scalar, n_shards,
                     np.asarray(bpart.row_bounds) * b,
                     np.asarray(bpart.col_bounds) * b)


def component_block(g_s: CSRMatrix, r0: int, b: int, c: int) -> CSRMatrix:
    """Per-shard component coupling submatrix A_c = A[c::b, c::b]
    restricted to this shard's rows: local node rows, GLOBAL node cols.
    ``r0`` (the shard's first scalar row) is block-aligned, so local
    scalar row i belongs to component (i % b)."""
    m = g_s.to_scipy()
    rows_c = m[c::b, :]
    keep = rows_c.tocoo()
    sel = (keep.col % b) == c
    out = sp.csr_matrix(
        (keep.data[sel], (keep.row[sel], keep.col[sel] // b)),
        shape=(rows_c.shape[0], g_s.n_cols // b))
    out.sum_duplicates()
    out.sort_indices()
    return CSRMatrix.from_scipy(out)


def bsr_extend_distributed(a: ParCSRMatrix, b: int, weights: np.ndarray,
                           coarsen: CoarsenType, interp: InterpType,
                           theta: float, make_transport,
                           strength_type=None):
    """One blocked-AMG level extension over the Transport seam: every
    stage runs on per-shard blocks + collectives, no global matrix on
    any rank (the distributed twin of
    ParBSRRugeStubenSolver.extend_hierarchy). Shared by the in-process
    setup_mode='distributed' and the multi-process spmd_bsr_setup.

    Returns (p_blocks scalar per-LOCAL-shard, p_comp_blocks [b] lists of
    per-LOCAL-shard nodal component P rows, states, c_blocks scalar
    coarse rows per-LOCAL-shard, part_c scalar coarse partition)."""
    from raptor_tpu.ruge_stuben import par_setup as ps

    part = a.partition
    S = part.n_shards
    fs = a.first_shard
    shards = a.shards()
    n_nodes = part.global_num_rows // b
    ncols = part.global_num_cols
    part_nodes = Partition(n_nodes, n_nodes, S,
                           np.asarray(part.row_bounds) // b,
                           np.asarray(part.col_bounds) // b)

    g_blocks = [blk.global_cols_csr(ncols) for blk in shards]
    # per-shard nodal condensation: scalar rows (GLOBAL cols) -> nodal
    # rows with global nodal cols; blocked comm moves b x b blocks as
    # these nodal rows + the component rows below (the reference's
    # block_size sends, core/comm_data.hpp, on the same scalar wire)
    nod_blocks = [nodal_matrix(g, b, int(part.row_bounds[fs + i]) // b)
                  for i, g in enumerate(g_blocks)]
    nod_par = ParCSRMatrix.from_local_rows(nod_blocks, part_nodes,
                                           first_shard=fs)
    tr_n = make_transport(nod_par)
    from raptor_tpu.core.types import StrengthType
    if strength_type in (None, StrengthType.Classical):
        masks = ps.dist_classical_strength(nod_par, theta, tr=tr_n)
    elif strength_type == StrengthType.Symmetric:
        masks = ps.dist_symmetric_strength(nod_par, theta, tr=tr_n)
    else:
        raise NotImplementedError(
            f"distributed BSR setup: strength_type {strength_type}")
    s_n = ps.strength_masks_to_par(nod_par, masks)
    w = weights[:n_nodes]
    tr_s = make_transport(s_n)
    if coarsen == CoarsenType.CLJP:
        states = ps.dist_split_cljp(s_n, w, tr=tr_s)
    elif coarsen == CoarsenType.PMIS:
        states = ps.dist_split_pmis(s_n, w, tr=tr_s)
    elif coarsen == CoarsenType.HMIS:
        states = ps.dist_split_hmis(s_n, w, tr=tr_s)
    else:
        states = ps.dist_split_falgout(s_n, w, tr=tr_s)
    states = np.asarray(states)

    # nodal strength patterns per local shard (for masking components)
    s_pats = []
    for blk in s_n.shards():
        g = blk.global_cols_csr(n_nodes).to_scipy()
        g.data = np.ones_like(g.data)
        s_pats.append(g)

    p_comp_blocks = []
    n_coarse = None
    for c in range(b):
        comp = [component_block(g, int(part.row_bounds[fs + i]), b, c)
                for i, g in enumerate(g_blocks)]
        sc = [CSRMatrix.from_scipy(
            comp[i].to_scipy().multiply(s_pats[i]).tocsr())
            for i in range(len(comp))]
        a_c = ParCSRMatrix.from_local_rows(comp, part_nodes,
                                           first_shard=fs)
        s_c = ParCSRMatrix.from_local_rows(sc, part_nodes,
                                           first_shard=fs)
        tr_c = make_transport(a_c)
        assert interp == InterpType.ModClassical, \
            "distributed BSR setup supports ModClassical interpolation"
        pc_blocks, n_coarse = ps.dist_mod_classical_interpolation(
            a_c, s_c, states, tr=tr_c, assemble=False)
        p_comp_blocks.append(pc_blocks)

    # block-diagonal scalar P rows per local shard
    p_blocks = []
    for i in range(len(shards)):
        rows, cols, vals = [], [], []
        for c in range(b):
            coo = p_comp_blocks[c][i].to_scipy().tocoo()
            rows.append(coo.row.astype(np.int64) * b + c)
            cols.append(coo.col.astype(np.int64) * b + c)
            vals.append(coo.data)
        nrows_s = int(part.row_bounds[fs + i + 1]
                      - part.row_bounds[fs + i])
        pm = sp.csr_matrix(
            (np.concatenate(vals),
             (np.concatenate(rows), np.concatenate(cols))),
            shape=(nrows_s, n_coarse * b))
        pm.sort_indices()
        p_blocks.append(CSRMatrix.from_scipy(pm))

    # coarse partition: nodal coarse bounds (C-nodes per shard) * b
    from raptor_tpu.core.types import CFState
    sel = states == CFState.Selected
    csum = np.concatenate([[0], np.cumsum(sel)])
    cb_nodes = csum[np.asarray(part_nodes.row_bounds)].astype(np.int64)
    cb = cb_nodes * b
    part_c = Partition(n_coarse * b, n_coarse * b, S, cb, cb)

    tr_a = make_transport(a)
    c_blocks = ps.dist_rap(a, p_blocks, tr=tr_a, coarse_bounds=cb,
                           assemble=False)
    return p_blocks, p_comp_blocks, states, c_blocks, part_c


class ParBSRRugeStubenSolver(ParMultilevel):
    """Blocked classical AMG: nodal coarsening on the block-norm graph,
    blockwise-expanded interpolation, scalar-native Galerkin RAP (the
    result stays block-structured because P is block-diagonal)."""

    def __init__(self, block_size: int, strong_threshold: float = 0.0,
                 coarsen_type: CoarsenType = CoarsenType.RS,
                 interp_type: InterpType = InterpType.ModClassical,
                 relax_type: RelaxType = RelaxType.Jacobi,
                 strength_type: StrengthType = StrengthType.Classical):
        super().__init__(strong_threshold, strength_type, relax_type)
        self.block_size = int(block_size)
        self.coarsen_type = coarsen_type
        self.interp_type = interp_type
        self.max_coarse = 50  # nodes
        self.p_nodals: List[CSRMatrix] = []

    def setup(self, af: ParCSRMatrix) -> None:
        b = self.block_size
        n = af.global_num_rows
        assert n % b == 0, "rows must be a multiple of the block size"
        # re-partition on block boundaries (to_ParBSR redistribution,
        # par_matrix.cpp:872-997)
        part = block_partition(n, af.global_num_cols, b,
                               af.partition.n_shards)
        af = ParCSRMatrix(af._g(), part)
        from raptor_tpu.utils.glibc_rand import form_rand_weights
        if self.weights is None:
            self.weights = form_rand_weights(n // b, 0)
        self.levels = [Level(A=af.copy())]
        while (self.levels[-1].A.global_num_rows // b > self.max_coarse
               and len(self.levels) < self.max_levels):
            self.extend_hierarchy()
        self.duplicate_coarse()

    def _extend_hierarchy_distributed(self) -> None:
        """Blocked level extension through the per-shard + transport
        stages (bsr_extend_distributed): nodal condensation, strength,
        CF split, per-component interpolation, and the Galerkin RAP all
        run on shard blocks + collectives — no global matrix required
        (closes the round-2 'BSR AMG has no distributed setup mode')."""
        from raptor_tpu.comm.transport import InProcessTransport

        b = self.block_size
        a = self.levels[-1].A
        p_blocks, p_comps, states, c_blocks, part_c = \
            bsr_extend_distributed(a, b, self.weights, self.coarsen_type,
                                   self.interp_type,
                                   self.strong_threshold,
                                   InProcessTransport,
                                   strength_type=self.strength_type)
        part = a.partition
        n_c = int(part_c.global_num_cols)
        # in-process: all shards local -> assemble for the device layer,
        # and re-partition the coarse level EVENLY on block boundaries
        # (the global path's rule; the blocked device packer assumes it)
        part_even = block_partition(n_c, n_c, b, part.n_shards)
        part_p = Partition(part.global_num_rows, n_c, part.n_shards,
                           part.row_bounds, part_even.col_bounds)
        pg = sp.vstack([pb.to_scipy() for pb in p_blocks]).tocsr()
        pg.sort_indices()
        self.levels[-1].P = ParCSRMatrix(CSRMatrix.from_scipy(pg),
                                         part_p)
        self.p_nodals.append([
            CSRMatrix.from_scipy(sp.vstack(
                [blk.to_scipy() for blk in p_comps[c]]).tocsr())
            for c in range(b)])
        acg = sp.vstack([cb.to_scipy() for cb in c_blocks]).tocsr()
        acg.sort_indices()
        self.levels.append(Level(A=ParCSRMatrix(
            CSRMatrix.from_scipy(acg), part_even)))

    def extend_hierarchy(self) -> None:
        """Shared nodal CF split on the block-norm graph + PER-COMPONENT
        interpolation weights from each component's own coupling
        submatrix A_c = A[c::b, c::b] masked to the nodal strength
        pattern — the unknown-based interpolation idea constrained to
        one common nodal coarse grid, so P's blocks are diagonal
        (diag(p_0[i,j], ..., p_{b-1}[i,j])) and every Galerkin product
        keeps exact b x b block structure."""
        if getattr(self, "setup_mode", "global") == "distributed":
            return self._extend_hierarchy_distributed()
        from raptor_tpu.ruge_stuben import cf_splitting as cf
        from raptor_tpu.ruge_stuben.interpolation import (
            direct_interpolation, mod_classical_interpolation)
        from raptor_tpu.ruge_stuben.strength import strength

        b = self.block_size
        a = self.levels[-1].A
        n_nodes = a.global_num_rows // b
        nod = nodal_matrix(a._g(), b)
        part_nodes = Partition(
            n_nodes, n_nodes, a.partition.n_shards,
            np.asarray(a.partition.row_bounds) // b,
            np.asarray(a.partition.col_bounds) // b)
        nod_par = ParCSRMatrix(nod, part_nodes)

        with self.setup_times.phase("strength"):
            s_n = strength(nod_par, self.strength_type,
                           self.strong_threshold)
        w = self.weights[:n_nodes]
        with self.setup_times.phase("cf_splitting"):
            ct = self.coarsen_type
            if ct == CoarsenType.RS:
                states = cf.split_rs_entry(s_n)
            elif ct == CoarsenType.CLJP:
                states = cf.split_cljp(s_n, w)
            elif ct == CoarsenType.PMIS:
                states = cf.split_pmis(s_n, w)
            elif ct == CoarsenType.HMIS:
                states = cf.split_hmis(s_n, w)
            else:
                states = cf.split_falgout(s_n, w)
            states = np.asarray(states)

        with self.setup_times.phase("interpolation"):
            g = a._g().to_scipy()
            snp = s_n.global_csr.to_scipy()
            snp_pat = sp.csr_matrix(
                (np.ones(snp.nnz), snp.indices, snp.indptr),
                shape=snp.shape)
            p_comps = []
            for c in range(b):
                a_c = g[c::b, :][:, c::b].tocsr()
                s_c = a_c.multiply(snp_pat).tocsr()
                s_c.sort_indices()
                interp = (direct_interpolation
                          if self.interp_type == InterpType.Direct
                          else mod_classical_interpolation)
                p_c = interp(CSRMatrix.from_scipy(a_c),
                             CSRMatrix.from_scipy(s_c), states)
                p_comps.append(p_c)
            self.p_nodals.append(p_comps)
            # block-diagonal assembly: (i*b+c, j*b+c) = p_c[i, j]
            nc = p_comps[0].n_cols
            rows, cols, vals = [], [], []
            for c in range(b):
                coo = p_comps[c].to_scipy().tocoo()
                rows.append(coo.row.astype(np.int64) * b + c)
                cols.append(coo.col.astype(np.int64) * b + c)
                vals.append(coo.data)
            pm = sp.csr_matrix(
                (np.concatenate(vals),
                 (np.concatenate(rows), np.concatenate(cols))),
                shape=(a.global_num_rows, nc * b))
            pm.sort_indices()
            p = CSRMatrix.from_scipy(pm)

        pp = ParCSRMatrix(p, Partition(
            a.global_num_rows, p.n_cols, a.partition.n_shards,
            a.partition.row_bounds,
            block_partition(p.n_cols, p.n_cols, b,
                            a.partition.n_shards).col_bounds))
        self.levels[-1].P = pp

        with self.setup_times.phase("RAP"):
            ap = a.multiply(pp)
            ac = pp.mult_T_mat(ap)
        self.levels.append(Level(A=ac))


_BSRLVL_DATA = ["Ab", "inv_diag", "Pn", "PnT"]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=_BSRLVL_DATA,
                   meta_fields=["cheb_lo", "cheb_hi"])
@dataclasses.dataclass
class BSRDeviceLevel:
    Ab: DeviceParBSR
    inv_diag: jnp.ndarray    # [S, RB, b, b] inverted diagonal blocks
    Pn: Optional[object]     # nodal DeviceParCSR (None on coarsest)
    PnT: Optional[object]
    # Chebyshev interval of D_block^{-1} A (host power iteration)
    cheb_lo: float = 0.0
    cheb_hi: float = 2.0


class BSRDeviceHierarchy:
    """Device solve over a ParBSRRugeStubenSolver hierarchy: block-ELL
    operators, damped block-Jacobi smoothing, per-component nodal
    transfers, redundant dense coarse LU."""

    def __init__(self, ml: ParBSRRugeStubenSolver, mesh,
                 dtype=jnp.float64, omega: float = 2.0 / 3.0,
                 sweeps: int = 2):
        self.ml = ml
        self.mesh = mesh
        self.dtype = dtype
        self.omega = float(omega)
        self.sweeps = int(sweeps)
        b = ml.block_size
        self.b = b
        lane_pad = 128 if jax.devices()[0].platform == "tpu" else 1

        levels = []
        for i, lvl in enumerate(ml.levels):
            Ab = device_put_bsr(lvl.A, b, b, mesh, dtype=dtype)
            inv = self._inv_diag_blocks(lvl.A, b, Ab.brows_pad, mesh,
                                        dtype)
            Pn = PnT = None
            if lvl.P is not None:
                p_comps = ml.p_nodals[i]
                part_nodes = Partition(
                    p_comps[0].n_rows, p_comps[0].n_cols,
                    lvl.A.partition.n_shards,
                    np.asarray(lvl.A.partition.row_bounds) // b,
                    np.asarray(ml.levels[i + 1].A.partition
                               .row_bounds) // b)
                Pn, PnT = [], []
                for p_c in p_comps:
                    pn_par = ParCSRMatrix(p_c, part_nodes)
                    Pn.append(dpar.device_put_matrix(
                        pn_par, mesh, dtype=dtype, lane_pad=lane_pad,
                        need_transpose=False))
                    PnT.append(dpar.device_put_matrix(
                        pn_par.transpose(), mesh, dtype=dtype,
                        lane_pad=lane_pad, need_transpose=False))
                Pn, PnT = tuple(Pn), tuple(PnT)
            lo, hi = self._cheb_interval(lvl.A, b)
            levels.append(BSRDeviceLevel(Ab, inv, Pn, PnT, lo, hi))
        self.levels: Tuple[BSRDeviceLevel, ...] = tuple(levels)

        # redundant coarse LU over the SCALAR coarse operator
        lu, piv = ml.coarse_lu
        self.lu = jnp.asarray(np.asarray(
            lu, dtype=jax.dtypes.canonicalize_dtype(dtype)))
        self.piv = jnp.asarray(np.asarray(piv, dtype=np.int32))
        part_c = ml.levels[-1].A.partition
        S = part_c.n_shards
        Rc = self.levels[-1].Ab.brows_pad * b
        n_c = part_c.global_num_rows
        gather_idx = np.zeros(n_c, dtype=np.int32)
        coarse_take = np.zeros((S, Rc), dtype=np.int32)
        for s in range(S):
            r0 = int(part_c.row_bounds[s])
            r1 = int(part_c.row_bounds[s + 1])
            gather_idx[r0:r1] = s * Rc + np.arange(r1 - r0)
            coarse_take[s, :r1 - r0] = np.arange(r0, r1)
        self.gather_idx = jnp.asarray(gather_idx)
        self.coarse_take = dpar._shard_leading(coarse_take, mesh)
        self.row_bounds = ml.levels[0].A.partition.row_bounds
        self._solve_jit = None

    @staticmethod
    def _cheb_interval(a: ParCSRMatrix, b: int):
        """Power-iteration lambda_max of D_block^{-1} A (host), hypre
        interval [0.3 lmax, 1.1 lmax]."""
        g = a._g().to_scipy()
        n = g.shape[0]
        gb = g.tobsr(blocksize=(b, b))
        nb = n // b
        rr = np.repeat(np.arange(nb), np.diff(gb.indptr))
        dblocks = np.zeros((nb, b, b))
        on_diag = gb.indices == rr
        dblocks[rr[on_diag]] = np.asarray(gb.data)[on_diag]
        sing = np.abs(np.linalg.det(dblocks)) < 1e-300
        dblocks[sing] = np.eye(b)
        dinv = np.linalg.inv(dblocks)
        rng = np.random.default_rng(7)
        v = rng.random(n) + 0.1
        v /= np.linalg.norm(v)
        lmax = 1.0
        for _ in range(12):
            w = np.einsum("rij,rj->ri", dinv,
                          (g @ v).reshape(nb, b)).reshape(-1)
            nw = np.linalg.norm(w)
            if nw <= 0:
                break
            lmax, v = nw, w / nw
        return 0.3 * float(lmax), 1.1 * float(lmax)

    @staticmethod
    def _inv_diag_blocks(a: ParCSRMatrix, b: int, rb_pad: int, mesh,
                         dtype):
        S = a.partition.n_shards
        out = np.zeros((S, rb_pad, b, b))
        out[:, :, np.arange(b), np.arange(b)] = 1.0   # identity padding
        g = a._g().to_scipy()
        for s in range(S):
            r0 = int(a.partition.row_bounds[s])
            r1 = int(a.partition.row_bounds[s + 1])
            nb = (r1 - r0) // b
            dblocks = np.zeros((nb, b, b))
            rows = g[r0:r1].tobsr(blocksize=(b, b))
            rr = np.repeat(np.arange(nb), np.diff(rows.indptr))
            on_diag = rows.indices == rr + r0 // b
            dblocks[rr[on_diag]] = np.asarray(rows.data)[on_diag]
            out[s, :nb] = np.linalg.inv(dblocks)
        return dpar._shard_leading(out, mesh, dtype)

    # --- shard-level pieces ----------------------------------------------------
    def _block_jacobi(self, lvl, x, b_vec):
        """Block-Chebyshev smoothing: the scalar Chebyshev recurrence in
        the block-Jacobi-preconditioned operator D_b^{-1} A (degree =
        ``sweeps``); plain damped block Jacobi when sweeps == 1."""
        Ab, inv = lvl.Ab, lvl.inv_diag

        def dinv(r):
            return jnp.einsum("rij,rj->ri", inv,
                              r.reshape(-1, self.b)).reshape(-1)

        if self.sweeps == 1:
            r = b_vec - bsr_spmv_shard(Ab, x)
            return x + self.omega * dinv(r)
        lo, hi = lvl.cheb_lo, lvl.cheb_hi
        th, de = (hi + lo) / 2.0, (hi - lo) / 2.0
        r = b_vec - bsr_spmv_shard(Ab, x)
        p = dinv(r) / th
        x = x + p
        sigma = th / de
        rho = 1.0 / sigma
        for _ in range(1, self.sweeps):
            r = b_vec - bsr_spmv_shard(Ab, x)
            rho_new = 1.0 / (2.0 * sigma - rho)
            p = (rho * rho_new) * p + (2.0 * rho_new / de) * dinv(r)
            x = x + p
            rho = rho_new
        return x

    def _restrict(self, PnT, r, rb_coarse):
        """[RBf*b] -> [RBc*b]: each component through ITS nodal P_c^T."""
        r2 = r.reshape(-1, self.b)
        outs = []
        for c in range(self.b):
            rc = jnp.pad(r2[:, c], (0, PnT[c].cols_pad - r2.shape[0]))
            outs.append(spmv_shard(PnT[c], rc)[:rb_coarse])
        return jnp.stack(outs, axis=1).reshape(-1)

    def _prolong(self, Pn, e, rb_fine):
        e2 = e.reshape(-1, self.b)
        outs = []
        for c in range(self.b):
            ec = jnp.pad(e2[:, c], (0, Pn[c].cols_pad - e2.shape[0]))
            outs.append(spmv_shard(Pn[c], ec)[:rb_fine])
        return jnp.stack(outs, axis=1).reshape(-1)

    def _coarse_solve(self, lu, piv, coarse_take, b_vec):
        ball = jax.lax.all_gather(b_vec, dpar.comm_axes())
        bvec = ball.reshape(-1)[self.gather_idx]
        y = jax.scipy.linalg.lu_solve((lu, piv), bvec)
        return y[coarse_take]

    def vcycle_shard(self, levels, lu, piv, coarse_take, x, b_vec,
                     level: int = 0):
        lvl = levels[level]
        Ab, Pn, PnT = lvl.Ab, lvl.Pn, lvl.PnT
        if level == len(levels) - 1:
            return self._coarse_solve(lu, piv, coarse_take, b_vec)
        x = self._block_jacobi(lvl, x, b_vec)
        r = b_vec - bsr_spmv_shard(Ab, x)
        rb_c = levels[level + 1].Ab.brows_pad
        rc = self._restrict(PnT, r, rb_c)
        ec = self.vcycle_shard(levels, lu, piv, coarse_take,
                               jnp.zeros_like(rc), rc, level + 1)
        x = x + self._prolong(Pn, ec, Ab.brows_pad)
        return self._block_jacobi(lvl, x, b_vec)

    # --- public solve ----------------------------------------------------------
    def vector(self, v: np.ndarray) -> jnp.ndarray:
        b = self.b
        RB = self.levels[0].Ab.brows_pad
        S = len(self.row_bounds) - 1
        out = np.zeros((S, RB * b))
        for s in range(S):
            r0 = int(self.row_bounds[s])
            r1 = int(self.row_bounds[s + 1])
            out[s, :r1 - r0] = v[r0:r1]
        return dpar._shard_leading(out, self.mesh, self.dtype)

    def host(self, v: np.ndarray) -> np.ndarray:
        v = np.asarray(v)
        outs = []
        for s in range(len(self.row_bounds) - 1):
            n = int(self.row_bounds[s + 1] - self.row_bounds[s])
            outs.append(v[s, :n])
        return np.concatenate(outs)

    def solve(self, x, b_vec, tol: float = 1e-7, max_iter: int = 100):
        mesh = self.mesh
        ax = dpar._leading_axes(mesh)
        from jax.sharding import PartitionSpec as P

        if self._solve_jit is None:
            def run(levels, lu, piv, ct, x, b_vec):
                def body(levels, lu, piv, ct, x, b_vec):
                    levels = jax.tree.map(lambda l: l[0], levels)
                    x0, b0, ct0 = x[0], b_vec[0], ct[0]
                    b_norm = jnp.sqrt(dot_shard(b0, b0))
                    b_norm = jnp.where(b_norm > 1e-300, b_norm, 1.0)

                    def rel(x):
                        r = b0 - bsr_spmv_shard(levels[0].Ab, x)
                        return jnp.sqrt(dot_shard(r, r)) / b_norm

                    hist = jnp.full(max_iter + 1, -1.0,
                                    dtype=b0.dtype).at[0].set(rel(x0))

                    def cond(st):
                        x, k, hist, rr = st
                        return (rr > tol) & (k < max_iter)

                    def step(st):
                        x, k, hist, rr = st
                        x = self.vcycle_shard(levels, lu, piv, ct0, x,
                                              b0)
                        rr = rel(x)
                        k = k + 1
                        return x, k, hist.at[k].set(rr), rr

                    x0, k, hist, rr = jax.lax.while_loop(
                        cond, step, (x0, jnp.array(0), hist,
                                     hist[0]))
                    return x0[None], hist, k

                return jax.shard_map(
                    body, mesh=mesh,
                    in_specs=dpar.leaf_specs(
                        (levels, )) + (P(), P(), P(ax, None),
                                       P(ax, None), P(ax, None)),
                    out_specs=(P(ax, None), P(), P()))(
                        levels, lu, piv, ct, x, b_vec)

            with dpar.use_comm_axes(ax):
                self._solve_jit = jax.jit(run)
        with dpar.use_comm_axes(ax):
            x, hist, k = self._solve_jit(self.levels, self.lu, self.piv,
                                         self.coarse_take, x, b_vec)
        return x, np.asarray(hist), int(k)

    def precond_pack(self):
        """Blocked V-cycle as a preconditioner for the scalar Krylov
        drivers (PCG over BSR operators). The scalar solver's vectors
        are [R_scalar]-padded; the pack re-layouts to the BSR [RB*b]
        space and back."""
        if getattr(self, "_precond_pack", None) is not None:
            return self._precond_pack
        ax = dpar._leading_axes(self.mesh)
        from jax.sharding import PartitionSpec as P
        data = (self.levels, self.lu, self.piv, self.coarse_take)
        specs = (dpar.leaf_specs(self.levels, ax), P(), P(), P(ax, None))

        def strip(d):
            levels, lu, piv, ct = d
            return (jax.tree.map(lambda l: l[0], levels), lu, piv, ct[0])

        nb = self.levels[0].Ab.brows_pad * self.b

        def apply(d, x0, r):
            levels, lu, piv, ct = d
            rb = r[:nb].astype(self.dtype)
            out = self.vcycle_shard(levels, lu, piv, ct,
                                    jnp.zeros_like(rb), rb)
            return jnp.pad(out, (0, r.shape[0] - nb)).astype(r.dtype)

        self._precond_pack = (data, specs, strip, apply)
        return self._precond_pack
