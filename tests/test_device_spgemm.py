"""Device-side SpGEMM (raptor_tpu/device/spgemm.py) vs the native host
kernel — the Galerkin RAP engines must agree.

On the CPU mesh both engines run f64, so structure must match EXACTLY
(same sort/dedup/zero-drop canonical form) and values to summation-order
roundoff.  The TPU runs the same code in f32; these tests pin the
algorithm, the bench pins the throughput.

Reference for semantics: util/linalg/matmult.cpp:90-226 (Gustavson with
zero_tol drop), par_matmult.cpp:79-441 (AP then P^T(AP))."""

import numpy as np
import pytest

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.device import spgemm as dsp
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, stencil_grid
from raptor_tpu.gallery.random import random_matrix


def _csr_close(a: CSRMatrix, b: CSRMatrix, tol=1e-12):
    assert a.n_rows == b.n_rows and a.n_cols == b.n_cols
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_array_equal(a.indices, b.indices)
    scale = max(1.0, np.abs(a.data).max() if a.nnz else 1.0)
    np.testing.assert_allclose(a.data, b.data, atol=tol * scale, rtol=0)


def _host_rap(a: CSRMatrix, p: CSRMatrix):
    ap = a.multiply(p)
    ac = p.transpose().multiply(ap)
    return ap, ac


@pytest.fixture(scope="module")
def aniso():
    st = diffusion_stencil_2d(0.001, np.pi / 8)
    return stencil_grid(st, (36, 36))


def test_ell_spgemm_random_vs_host():
    a = random_matrix(300, 300, 6, seed=11)
    b = random_matrix(300, 200, 4, seed=12)
    ref = a.multiply(b)
    got = dsp.spgemm_device(a, b)
    _csr_close(got, ref)


def test_dia_path_stencil_vs_host(aniso):
    # stencil A -> the DIA fast path (csr_to_dia succeeds)
    assert dsp.csr_to_dia(aniso) is not None
    b = random_matrix(aniso.n_cols, 150, 3, seed=5)
    ref = aniso.multiply(b)
    got = dsp.spgemm_device(aniso, b)
    _csr_close(got, ref)


def test_rap_device_vs_host(aniso):
    # P from a real direct-interpolation pass so the pattern is AMG-like
    n = aniso.n_rows
    p = random_matrix(n, n // 4, 3, seed=7)
    ref_ap, ref_ac = _host_rap(aniso, p)
    ap, ac, ap_nnz = dsp.rap_device(aniso, p)
    assert ap_nnz == ref_ap.nnz
    _csr_close(ap, ref_ap)
    _csr_close(ac, ref_ac, tol=1e-11)


def test_cap_overflow_retry():
    # W guess too small forces the exact-width second pass
    a = random_matrix(100, 100, 8, seed=3)
    b = random_matrix(100, 100, 8, seed=4)
    ref = a.multiply(b)
    got = dsp.spgemm_device(a, b, w_cap=4)
    _csr_close(got, ref)


def test_zero_drop_matches_host():
    # exact cancellations: A has +1/-1 entries hitting the same output
    ind = np.array([0, 1, 0, 1], dtype=np.int64)
    a = CSRMatrix(2, 2, np.array([0, 2, 4], dtype=np.int64), ind,
                  np.array([1.0, -1.0, 2.0, 1.0]))
    b = CSRMatrix(2, 2, np.array([0, 2, 4], dtype=np.int64), ind,
                  np.array([1.0, 1.0, 1.0, 1.0]))
    ref = a.multiply(b)
    got = dsp.spgemm_device(a, b)
    _csr_close(got, ref)


def test_solver_rap_mode_device_matches_host(aniso):
    """End-to-end: full RS hierarchy with rap_mode='device' equals the
    host-engine hierarchy (CPU mesh -> both f64)."""
    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    part = Partition.create(aniso.n_rows, aniso.n_cols, 1)
    results = []
    for mode in ("host", "device"):
        ml = ParRugeStubenSolver(coarsen_type=CoarsenType.RS,
                                 interp_type=InterpType.ModClassical)
        ml.rap_mode = mode
        ml.setup(ParCSRMatrix(aniso, part))
        results.append(ml)
    h, d = results
    assert h.num_levels == d.num_levels
    for lh, ld in zip(h.levels, d.levels):
        _csr_close(ld.A.global_csr, lh.A.global_csr, tol=1e-11)
