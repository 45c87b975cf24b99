"""Par container classes beyond ParCSR (core/par_matrix.hpp:345
ParCOOMatrix, :613 ParBSRMatrix, :701 ParCSCMatrix) and the distributed
transpose (par_matrix.cpp:694-858)."""

import numpy as np
import pytest

from raptor_tpu.core.par_matrix import (ParBSRMatrix, ParCOOMatrix,
                                        ParCSCMatrix, ParCSRMatrix)
from raptor_tpu.core.partition import Partition
from raptor_tpu.gallery.fem import par_fem
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid


def test_par_coo_assembly_finalize():
    """add_global_value + finalize, duplicates summed
    (add_global_value par_matrix.cpp:26-78, finalize :114-162)."""
    part = Partition.create(10, 10, 2)
    coo = ParCOOMatrix(part)
    coo.add_global_value(0, 0, 2.0)
    coo.add_global_value(0, 0, 1.0)
    coo.add_values([1, 2, 9], [0, 2, 9], [1.0, 5.0, 7.0])
    a = coo.finalize()
    m = a.global_csr.to_scipy()
    assert m[0, 0] == 3.0
    assert m[2, 2] == 5.0
    assert a.nnz == 4


@pytest.mark.parametrize("n_shards", [1, 4])
def test_par_csc_round_trip_and_transpose(n_shards):
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (24, 24), n_shards)
    csc = ParCSCMatrix(A)
    back = csc.to_par_csr()
    assert np.array_equal(back.global_csr.indptr, A.global_csr.indptr)
    np.testing.assert_allclose(back.global_csr.data, A.global_csr.data)
    t = csc.transpose()
    ref = A.global_csr.transpose()
    assert np.array_equal(t.global_csr.indices, ref.indices)
    np.testing.assert_allclose(t.global_csr.data, ref.data)


@pytest.mark.parametrize("n_shards", [1, 4])
def test_dist_transpose_matches_host(n_shards):
    from raptor_tpu.ruge_stuben.par_setup import dist_transpose
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (20, 20), n_shards)
    T = dist_transpose(A)
    ref = A.global_csr.transpose()
    assert np.array_equal(T.indptr, ref.indptr)
    assert np.array_equal(T.indices, ref.indices)
    np.testing.assert_allclose(T.data, ref.data, rtol=0)


def test_dist_transpose_multiproc():
    """Distributed transpose in real processes — each rank gets only its
    row block of A^T."""
    from raptor_tpu.comm.multiproc import MultiProcessTransport, run_spmd
    from raptor_tpu.ruge_stuben.par_setup import dist_transpose

    world = 4
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (20, 20), world)
    part = A.partition
    ncols = part.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in A.shards()]

    def worker(rank, group, blocks, part):
        a = ParCSRMatrix.from_local_rows([blocks[rank]], part,
                                         first_shard=rank)
        tr = MultiProcessTransport(group, a)
        return dist_transpose(a, tr=tr, assemble=False)[0]

    results = run_spmd(world, worker, blocks, part)
    import scipy.sparse as sp
    T = sp.vstack([b.to_scipy() for b in results]).tocsr()
    ref = A.global_csr.transpose().to_scipy()
    assert (abs(T - ref).max() if T.nnz + ref.nnz else 0.0) == 0.0


def test_par_bsr_container():
    K, _ = par_fem("elasticity", 12, 6, 2)
    pb = ParBSRMatrix(K, 2)
    assert pb.b_rows == 2
    lb = pb.local_bsr(0)
    assert lb.b_rows == 2 and lb.blocks.shape[1:] == (2, 2)
    x = np.random.default_rng(0).random(K.global_num_cols)
    np.testing.assert_allclose(pb.mult(x), K.mult(x))
    # device path exists
    import jax

    from raptor_tpu.device import par as dpar
    from raptor_tpu.device.bsr import bsr_spmv
    mesh = dpar.make_mesh(2)
    dAb = pb.to_device(mesh)
    xb = dpar.device_put_vector(x, pb.partition.col_bounds,
                                dAb.bcols_pad * pb.b_cols, mesh)
    y = bsr_spmv(mesh, dAb, xb)
    yh = []
    for s in range(2):
        r0 = int(pb.partition.row_bounds[s])
        r1 = int(pb.partition.row_bounds[s + 1])
        yh.append(np.asarray(y)[s, :r1 - r0])
    np.testing.assert_allclose(np.concatenate(yh), K.mult(x),
                               rtol=1e-12)


def test_par_csc_local_view():
    """ParCSC over a LOCAL-VIEW ParCSR: per-shard CSC blocks, round
    trip, and the distributed transpose — no global matrix anywhere
    (core/par_matrix.hpp:701-790 per-rank data model)."""
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (20, 20), 4)
    ncols = A.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in A.shards()]
    local = ParCSRMatrix.from_local_rows(blocks, A.partition)
    pc = ParCSCMatrix(local)
    assert pc.csc is None
    # per-shard CSC blocks reproduce the row blocks
    for i in range(4):
        np.testing.assert_array_equal(
            pc.local_csc(i).to_csr().to_scipy().toarray(),
            blocks[i].to_scipy().toarray())
    # round trip stays a local view
    rt = pc.to_par_csr()
    assert rt.is_local_view
    np.testing.assert_allclose(
        rt.assemble_global().to_scipy().toarray(),
        A.global_csr.to_scipy().toarray())
    # distributed transpose over the seam
    T = pc.transpose()
    assert T.is_local_view
    np.testing.assert_allclose(
        T.assemble_global().to_scipy().toarray(),
        A.global_csr.to_scipy().toarray().T)


def test_par_bsr_local_view():
    """ParBSR from a LOCAL-VIEW ParCSR: the CSR->BSR block-aligned
    redistribution routes rows over the Transport seam
    (par_matrix.cpp:872-997); per-shard BSR blocks match the in-process
    construction."""
    K, _ = par_fem("elasticity", 12, 6, 2)
    ncols = K.global_num_cols
    blocks = [blk.global_cols_csr(ncols) for blk in K.shards()]
    local = ParCSRMatrix.from_local_rows(blocks, K.partition)
    pb_local = ParBSRMatrix(local, 2)
    pb_ref = ParBSRMatrix(K, 2)
    assert pb_local.par_csr.is_local_view
    np.testing.assert_array_equal(pb_local.partition.row_bounds,
                                  pb_ref.partition.row_bounds)
    for s in range(K.partition.n_shards):
        a = pb_local.local_bsr(s)
        b = pb_ref.local_bsr(s)
        np.testing.assert_array_equal(a.indptr, b.indptr)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_array_equal(a.blocks, b.blocks)


def test_par_add_subtract(n_shards=4):
    """A + B / A - B on sharded containers vs the scipy oracle
    (util/tests/test_par_add.cpp)."""
    A = par_stencil_grid(diffusion_stencil_2d(1.0, 0.0), (20, 22),
                         n_shards)
    B = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (20, 22), n_shards)
    a, b = A.global_csr.to_scipy(), B.global_csr.to_scipy()
    C = A.add(B)
    D = A.subtract(B)
    assert abs(C.global_csr.to_scipy() - (a + b)).max() < 1e-14
    assert abs(D.global_csr.to_scipy() - (a - b)).max() < 1e-14
    x = np.random.default_rng(1).random(A.global_num_cols)
    np.testing.assert_allclose(C.mult(x), (a + b) @ x, atol=1e-12)


def test_par_bcoo_assembly_finalize():
    """Blocked assembly: add_block at global block coordinates,
    duplicates summed, finalize -> ParBSR (core/par_matrix.hpp:424
    ParBCOOMatrix + the block add_value path)."""
    from raptor_tpu.core.par_matrix import ParBCOOMatrix

    part = Partition.create(8, 8, 2)
    coo = ParBCOOMatrix(part, 2)
    eye = np.eye(2)
    for i in range(4):
        coo.add_block(i, i, (i + 1.0) * eye)
    coo.add_block(0, 1, np.array([[1.0, 2.0], [3.0, 4.0]]))
    coo.add_block(0, 1, np.array([[1.0, 0.0], [0.0, 1.0]]))  # dup sums
    pb = coo.finalize()
    assert pb.b_rows == 2
    g = pb.par_csr.global_csr.to_scipy().toarray()
    np.testing.assert_allclose(g[0:2, 2:4],
                               np.array([[2.0, 2.0], [3.0, 5.0]]))
    np.testing.assert_allclose(np.diag(g),
                               [1, 1, 2, 2, 3, 3, 4, 4])


def test_par_bsc_view_round_trip():
    """ParBSC per-shard blocked column views reproduce the row blocks
    (core/par_matrix.hpp:792 ParBSCMatrix)."""
    from raptor_tpu.core.par_matrix import ParBSCMatrix

    K, _ = par_fem("elasticity", 12, 6, 2)
    pb = ParBSRMatrix(K, 2)
    pc = ParBSCMatrix(pb)
    for s in range(2):
        back = pc.local_bsc(s).to_bsr()
        ref = pb.local_bsr(s)
        np.testing.assert_array_equal(back.indptr, ref.indptr)
        np.testing.assert_array_equal(back.indices, ref.indices)
        np.testing.assert_allclose(back.blocks, ref.blocks)
    assert pc.to_par_bsr() is pb
