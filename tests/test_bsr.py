"""Blocked (BSR) matrix tests: host container conversions and the sharded
blocked SpMV (core/tests/test_bsr_matrix.cpp, test_par_block_matrix.cpp,
test_par_block_conversion.cpp equivalents)."""

import numpy as np
import pytest

from raptor_tpu.core.matrix import BSRMatrix, CSRMatrix, compare
from raptor_tpu.core.par_matrix import par_matrix_from_scipy
from raptor_tpu.device import par as dpar
from raptor_tpu.device.bsr import bsr_spmv, device_put_bsr
from raptor_tpu.gallery.stencils import laplace_stencil_27pt, stencil_grid


def _block_matrix():
    # 27-pt Laplacian has rows divisible by small blocks on a (8,8,8) grid
    a = stencil_grid(laplace_stencil_27pt(), (8, 8, 8))
    return a


def test_bsr_roundtrip():
    a = _block_matrix()
    b = BSRMatrix.from_csr(a, 2, 2)
    compare(b.to_csr(), a, atol=0.0)


def test_bsr_host_spmv():
    a = _block_matrix()
    b = BSRMatrix.from_csr(a, 4, 4)
    x = np.arange(a.n_cols, dtype=np.float64)
    np.testing.assert_allclose(b.mult(x), a.mult(x), atol=1e-12)
    np.testing.assert_allclose(b.mult_T(x), a.mult_T(x), atol=1e-12)


@pytest.mark.parametrize("n_shards", [1, 4, 8])
@pytest.mark.parametrize("bs", [2, 4])
def test_device_bsr_spmv(n_shards, bs):
    a = _block_matrix()
    A = par_matrix_from_scipy(a.to_scipy(), n_shards)
    mesh = dpar.make_mesh(n_shards)
    dB = device_put_bsr(A, bs, bs, mesh)

    xh = np.random.default_rng(3).standard_normal(a.n_cols)
    # block partition bounds (scalar level)
    from raptor_tpu.core.partition import Partition
    bpart = Partition.create(a.n_rows // bs, a.n_cols // bs, n_shards)
    col_bounds = bpart.col_bounds * bs
    row_bounds = bpart.row_bounds * bs
    x = dpar.device_put_vector(xh, col_bounds, dB.bcols_pad * bs, mesh)
    b = bsr_spmv(mesh, dB, x)
    np.testing.assert_allclose(
        dpar.host_vector(np.asarray(b), row_bounds), a.mult(xh), atol=1e-10)


def test_bcoo_bsc_round_trips():
    """BCOO/BSC containers (core/matrix.hpp:1078, :1195): conversions
    through BSR preserve values, duplicates sum."""
    import scipy.sparse as sp

    from raptor_tpu.core.matrix import (BCOOMatrix, BSCMatrix, BSRMatrix,
                                        CSRMatrix)
    rng = np.random.default_rng(3)
    m = sp.random(32, 24, density=0.25, random_state=rng, format="csr")
    a = CSRMatrix.from_scipy(m)
    b = BSRMatrix.from_csr(a, 4, 4)
    bc = BCOOMatrix.from_bsr(b)
    np.testing.assert_allclose(bc.to_bsr().to_csr().to_dense(),
                               a.to_dense(), atol=1e-14)
    # duplicate blocks sum
    bc2 = BCOOMatrix(8, 8, 4, 4, np.array([0, 0, 1]), np.array([1, 1, 0]),
                     np.ones((3, 4, 4)))
    d = bc2.to_bsr().to_csr().to_dense()
    assert np.allclose(d[:4, 4:], 2.0)
    assert np.allclose(d[4:, :4], 1.0)
    bsc = BSCMatrix.from_bsr(b)
    np.testing.assert_allclose(bsc.to_bsr().to_csr().to_dense(),
                               a.to_dense(), atol=1e-14)
