"""Diagonal scaling, repartitioning, and sparsification tests
(util/tests/test_par_scale.cpp, test_repartition.cpp,
multilevel/tests/test_par_sparsify.cpp equivalents)."""

import numpy as np

from raptor_tpu.core.matrix import compare
from raptor_tpu.core.types import StrengthType
from raptor_tpu.gallery.io import read_pm
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.linalg.diag_scale import (
    diagonally_scale, diagonally_unscale, row_scale)
from raptor_tpu.linalg.repartition import (
    make_contiguous, partition_graph, repartition_matrix)
from raptor_tpu.linalg.sparsify import injection_matrix, sparsify


def _aniso(n_shards=4, grid=(25, 25)):
    return par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), grid,
                            n_shards)


def test_row_scale():
    A = _aniso()
    rng = np.random.default_rng(0)
    b = rng.standard_normal(A.global_num_rows)
    As, bs = row_scale(A, b)
    # scaled system has unit diagonal and equivalent solutions
    np.testing.assert_allclose(As.diagonal(), 1.0)
    x = np.linalg.solve(A.global_csr.to_dense(), b)
    xs = np.linalg.solve(As.global_csr.to_dense(), bs)
    np.testing.assert_allclose(x, xs, atol=1e-8)


def test_diagonally_scale_roundtrip():
    A = _aniso()
    rng = np.random.default_rng(1)
    b = rng.standard_normal(A.global_num_rows)
    As, bs, scales = diagonally_scale(A, b)
    np.testing.assert_allclose(np.abs(As.diagonal()), 1.0)
    xs = np.linalg.solve(As.global_csr.to_dense(), bs)
    x = diagonally_unscale(xs, scales)
    np.testing.assert_allclose(A.mult(x), b, atol=1e-8)


def test_repartition_preserves_spmv():
    A = _aniso()
    proc = partition_graph(A, 4)
    assert set(np.unique(proc)) <= set(range(4))
    An, perm = repartition_matrix(A, proc)
    x = np.random.default_rng(2).standard_normal(A.global_num_cols)
    # permuted operator acts like the original under the permutation
    np.testing.assert_allclose(An.mult(x[perm]), A.mult(x)[perm], atol=1e-12)
    # contiguity: each shard's rows map to one part
    for s in range(4):
        r0, r1 = An.partition.row_bounds[s], An.partition.row_bounds[s + 1]
        assert np.all(proc[perm[r0:r1]] == s)


def test_kway_partitioner_quality(test_data):
    """Native multilevel k-way must beat RCM banding on edge cut AND
    halo volume for unstructured operators (the value ParMETIS gives
    the reference, parmetis_wrapper.hpp:12), while staying balanced."""
    from raptor_tpu import native
    from raptor_tpu.core.par_matrix import par_matrix_from_scipy
    from raptor_tpu.gallery.io import read_pm
    from raptor_tpu.linalg.repartition import comm_volume

    if not native.available():
        import pytest
        pytest.skip("native kernels unavailable")

    for fname in ("facebook_combined.pm", "random.pm"):
        m = read_pm(test_data / fname).to_scipy().tocsr()
        A = par_matrix_from_scipy(m, 8)
        k = 8
        kw = partition_graph(A, k, method="kway")
        rcm = partition_graph(A, k, method="rcm")
        vk, vr = comm_volume(A, kw), comm_volume(A, rcm)
        n = A.global_num_rows
        # balance within the refiner's 5% cap (plus rounding)
        assert vk["max_part_rows"] <= int(np.ceil(1.06 * n / k)), fname
        # strictly better cut and halo than banding on irregular graphs
        assert vk["edge_cut"] < vr["edge_cut"], (
            fname, vk["edge_cut"], vr["edge_cut"])
        assert vk["halo_values"] < vr["halo_values"], (
            fname, vk["halo_values"], vr["halo_values"])
        # covers all parts, deterministic across calls
        assert set(np.unique(kw)) == set(range(k))
        np.testing.assert_array_equal(
            kw, partition_graph(A, k, method="kway"))


def test_kway_repartition_end_to_end():
    """kway assignment drives repartition_matrix like any proc map."""
    A = _aniso()
    proc = partition_graph(A, 4, method="kway")
    An, perm = repartition_matrix(A, proc)
    x = np.random.default_rng(3).standard_normal(A.global_num_cols)
    np.testing.assert_allclose(An.mult(x[perm]), A.mult(x)[perm],
                               atol=1e-12)


def test_make_contiguous_identity():
    A = _aniso()
    proc = np.repeat(np.arange(4), A.global_num_rows // 4 + 1)[
        :A.global_num_rows]
    An, perm = make_contiguous(A, proc)
    np.testing.assert_array_equal(perm, np.arange(A.global_num_rows))
    compare(An.global_csr, A.global_csr, atol=0.0)


def test_sparsify_row_sums_preserved(test_data):
    from raptor_tpu.ruge_stuben.cf_splitting import split_cljp
    from raptor_tpu.ruge_stuben.interpolation import par_interpolation
    from raptor_tpu.ruge_stuben.strength import strength
    from raptor_tpu.core.par_matrix import par_matrix_from_scipy

    weights = np.loadtxt(test_data / "weights.txt")
    A = par_matrix_from_scipy(read_pm(test_data / "rss_A0.pm").to_scipy(), 4)
    s = strength(A.global_csr, StrengthType.Classical, 0.25)
    states = split_cljp(s, weights[:A.global_num_rows])
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    P = par_interpolation(A, ParCSRMatrix(s, A.partition), states,
                          "mod_classical")
    AP = A.multiply(P)
    Ac = P.transpose().multiply(AP)
    I = injection_matrix(states)

    Ac_sp = sparsify(A, P, I, AP, Ac, 0.1)
    # row sums preserved exactly; nnz reduced
    np.testing.assert_allclose(
        np.asarray(Ac_sp.global_csr.to_scipy().sum(axis=1)).ravel(),
        np.asarray(Ac.global_csr.to_scipy().sum(axis=1)).ravel(), atol=1e-12)
    assert Ac_sp.nnz < Ac.nnz
    # minimal pattern M is kept: Ac_sp must still be usable in a solve
    # (diagonal intact)
    assert np.all(Ac_sp.diagonal() != 0)


def test_scaled_amg_solves_original_system():
    """AMG on the diagonally-scaled operator solves the ORIGINAL system
    after unscaling (test_par_scale_aniso.cpp flow: scale -> setup ->
    solve -> unscale -> residual check on the unscaled system)."""
    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = _aniso(4, (25, 25))
    rng = np.random.default_rng(3)
    b = A.mult(rng.random(A.global_num_rows))
    As, bs, scales = diagonally_scale(A, b)

    ml = ParRugeStubenSolver(0.25)
    ml.solve_tol = 1e-9
    ml.setup(As)
    mesh = dpar.make_mesh(4)
    dh = DeviceHierarchy(ml, mesh)
    res = dh.solve(dh.vector(np.zeros_like(bs)), dh.vector(bs))
    xs = dh.host(res.x)
    x = diagonally_unscale(xs, scales)
    r = np.linalg.norm(b - A.mult(x)) / np.linalg.norm(b)
    assert r < 1e-8, r


def test_lp_partitioner_local_view_matches_global(test_data):
    """The distributed (local-view) repartition path: label-propagation
    partitioner + transport row migration equal the global
    make_contiguous exactly, and the refined cut never worsens the
    block partition (repartition.cpp:64's distributed role; the
    multi-process twin runs in tests/test_multiproc.py)."""
    import scipy.sparse as sp

    from raptor_tpu.comm.transport import InProcessTransport
    from raptor_tpu.core.par_matrix import (ParCSRMatrix,
                                            par_matrix_from_scipy)
    from raptor_tpu.gallery.io import read_pm
    from raptor_tpu.linalg.repartition import (comm_volume,
                                               dist_partition_graph,
                                               make_contiguous)

    m = read_pm(test_data / "random.pm").to_scipy().tocsr()
    n = m.shape[0]
    S = 4
    Ap = par_matrix_from_scipy(m, S)
    labels = dist_partition_graph(Ap, InProcessTransport(Ap))
    proc = np.concatenate(labels)
    block_proc = np.repeat(np.arange(S), np.diff(Ap.partition.row_bounds))
    assert (comm_volume(Ap, proc)["edge_cut"]
            <= comm_volume(Ap, block_proc)["edge_cut"])
    cap = int(np.ceil(n / S * 1.05))
    assert np.bincount(proc, minlength=S).max() <= cap

    A_ref, perm_ref = make_contiguous(Ap, proc)
    # the same migration through the transport on a LOCAL VIEW
    blocks = [blk.global_cols_csr(n) for blk in Ap.shards()]
    Alv = ParCSRMatrix.from_local_rows(blocks, Ap.partition,
                                       first_shard=0)
    tr = InProcessTransport(Alv)
    labels_lv = partition_graph(Alv, tr=tr)
    assert all(np.array_equal(a, b) for a, b in zip(labels, labels_lv))
    A_new, perms = repartition_matrix(Alv, labels_lv, tr=tr)
    assert A_new.is_local_view
    assert np.array_equal(np.concatenate(perms), perm_ref)
    got = A_new.assemble_global()
    want = A_ref.global_csr
    assert np.array_equal(got.indptr, want.indptr)
    assert np.array_equal(got.indices, want.indices)
    np.testing.assert_allclose(got.data, want.data, rtol=1e-14)
