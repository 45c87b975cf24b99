"""Device-side extended+i interpolation (device/interp.py) vs the host
native kernel: pattern-exact, values to f64 roundoff (the same contract
as the device RAP tests — on CPU meshes the device path runs f64)."""

import numpy as np
import pytest

import jax

from raptor_tpu import native
from raptor_tpu.core.types import CoarsenType, InterpType, StrengthType
from raptor_tpu.device.interp import extended_interp_device
from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                         laplace_stencil_27pt,
                                         par_stencil_grid)
from raptor_tpu.ruge_stuben import cf_splitting as cf
from raptor_tpu.ruge_stuben.interpolation import (_coarse_map,
                                                  extended_interpolation,
                                                  par_interpolation)
from raptor_tpu.ruge_stuben.strength import strength
from raptor_tpu.utils.glibc_rand import form_rand_weights

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native kernels unavailable")


def _device_p(A, s, states):
    a = A.global_csr
    a_indptr, a_indices, _ = a.sorted_csr()
    s_indptr, s_indices, _ = s.global_csr.sorted_csr()
    strong = native.mark_strong(a_indptr, a_indices, s_indptr, s_indices,
                                a.n_rows)
    col_to_new, n_coarse = _coarse_map(states)
    return extended_interp_device(a, strong, np.asarray(states),
                                  col_to_new, n_coarse)


def _check(A, splitter, theta=0.25):
    w = form_rand_weights(A.global_num_rows, 0)
    s = strength(A, StrengthType.Classical, theta, 1, None)
    states = np.asarray(splitter(s, w))
    ph = extended_interpolation(A.global_csr, s.global_csr, states)
    pd = _device_p(A, s, states)
    assert np.array_equal(pd.indptr, ph.indptr)
    assert np.array_equal(pd.indices, ph.indices)
    np.testing.assert_allclose(pd.data, ph.data, rtol=0, atol=1e-12)


def test_2d_aniso_pmis():
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24), 1)
    _check(A, cf.split_pmis)


def test_2d_aniso_hmis():
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (32, 32), 1)
    _check(A, cf.split_hmis)


def test_3d_lap27_pmis():
    A = par_stencil_grid(laplace_stencil_27pt(), (10, 10, 10), 1)
    _check(A, cf.split_pmis)


def test_2d_cljp_mild():
    A = par_stencil_grid(diffusion_stencil_2d(0.4, 0.0), (20, 20), 1)
    _check(A, cf.split_cljp)


def test_random_matrix_edges():
    """Unstructured operator: exercises missing a_ki transposes, tiny-D
    folds, rows with no strong-C, and NoNeighbors rows."""
    from raptor_tpu.core.matrix import CSRMatrix
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    from raptor_tpu.core.partition import Partition
    rng = np.random.default_rng(7)
    n = 160
    import scipy.sparse as sp
    m = sp.random(n, n, density=0.05, random_state=3, format="csr")
    m = m + m.T.multiply(0.3)                # NON-symmetric values
    m = m.tocsr()
    m.setdiag(np.abs(m).sum(axis=1).A1 + 0.5)
    m.sort_indices()
    A = ParCSRMatrix(CSRMatrix.from_scipy(m.tocsr()),
                     Partition.create(n, n, 1))
    _check(A, cf.split_pmis, theta=0.5)


def test_per_level_replay_all_levels():
    """Device P matches the host P on EVERY level of a real hierarchy
    (coarse operators are unstructured — the hard inputs).  The
    whole-hierarchy comparison is deliberately per-level replay:
    1e-16 value differences flip filter_interp threshold ties
    downstream, which is summation-order chaos, not a defect."""
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
    A = par_stencil_grid(laplace_stencil_27pt(), (16, 16, 16), 1)
    ml = ParRugeStubenSolver(0.25, CoarsenType.PMIS, InterpType.Extended)
    ml.interp_mode = "host"
    ml.rap_mode = "host"
    ml.setup(A)
    for lvl in ml.levels[:-1]:
        a = lvl.A
        w = form_rand_weights(a.global_num_rows, 0)
        s = strength(a, StrengthType.Classical, 0.25, 1, None)
        states = np.asarray(cf.split_pmis(s, ml.weights[:a.global_num_rows]))
        ph = extended_interpolation(a.global_csr, s.global_csr, states)
        pd = _device_p(a, s, states)
        assert np.array_equal(pd.indptr, ph.indptr)
        assert np.array_equal(pd.indices, ph.indices)
        np.testing.assert_allclose(pd.data, ph.data, rtol=0, atol=1e-12)


def test_solver_interp_mode_device_converges():
    """interp_mode='device' produces a hierarchy of the same depth that
    converges like the host one."""
    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (48, 48), 1)
    b = A.mult(np.ones(A.global_num_rows))
    iters = {}
    for mode in ("host", "device"):
        ml = ParRugeStubenSolver(0.25, CoarsenType.HMIS,
                                 InterpType.Extended)
        ml.interp_mode = mode
        ml.rap_mode = "host"
        ml.setup(A)
        dh = DeviceHierarchy(ml, dpar.make_mesh(1))
        r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
        iters[mode] = int(r.n_iters)
    assert abs(iters["device"] - iters["host"]) <= 2


def _device_p_mc(A, s, states, variables=None, num_variables=1):
    from raptor_tpu.device.interp import mod_classical_interp_device
    a = A.global_csr
    a_indptr, a_indices, _ = a.sorted_csr()
    s_indptr, s_indices, _ = s.global_csr.sorted_csr()
    strong = native.mark_strong(a_indptr, a_indices, s_indptr, s_indices,
                                a.n_rows)
    col_to_new, n_coarse = _coarse_map(states)
    return mod_classical_interp_device(a, strong, np.asarray(states),
                                       col_to_new, n_coarse, variables,
                                       num_variables)


def _check_mc(A, splitter, theta=0.25, variables=None, num_variables=1):
    from raptor_tpu.ruge_stuben.interpolation import (
        mod_classical_interpolation)
    w = form_rand_weights(A.global_num_rows, 0)
    s = strength(A, StrengthType.Classical, theta, num_variables,
                 variables)
    states = np.asarray(splitter(s, w))
    ph = mod_classical_interpolation(A.global_csr, s.global_csr, states,
                                     num_variables, variables)
    pd = _device_p_mc(A, s, states, variables, num_variables)
    assert np.array_equal(pd.indptr, ph.indptr)
    assert np.array_equal(pd.indices, ph.indices)
    np.testing.assert_allclose(pd.data, ph.data, rtol=0, atol=1e-12)


def test_mc_2d_aniso_cljp():
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (32, 32), 1)
    _check_mc(A, cf.split_cljp)


def test_mc_3d_pmis():
    A = par_stencil_grid(laplace_stencil_27pt(), (10, 10, 10), 1)
    _check_mc(A, cf.split_pmis)


def test_mc_multivariable():
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (20, 20), 1)
    variables = (np.arange(A.global_num_rows) % 2).astype(np.int64)
    _check_mc(A, cf.split_cljp, variables=variables, num_variables=2)


def test_mc_per_level_replay():
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
    from raptor_tpu.ruge_stuben.interpolation import (
        mod_classical_interpolation)
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (40, 40), 1)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical)
    ml.interp_mode = "host"
    ml.rap_mode = "host"
    ml.setup(A)
    for lvl in ml.levels[:-1]:
        a = lvl.A
        s = strength(a, StrengthType.Classical, 0.25, 1, None)
        states = np.asarray(cf.split_cljp(
            s, ml.weights[:a.global_num_rows]))
        ph = mod_classical_interpolation(a.global_csr, s.global_csr,
                                         states)
        pd = _device_p_mc(a, s, states)
        assert np.array_equal(pd.indptr, ph.indptr)
        assert np.array_equal(pd.indices, ph.indices)
        np.testing.assert_allclose(pd.data, ph.data, rtol=0, atol=1e-12)


def test_device_failure_falls_back_to_host(monkeypatch):
    """ANY device-engine exception (XLA error, relay death, overflow)
    must fall back to the host kernel with a warning — setup never
    aborts on an engine choice."""
    import warnings

    from raptor_tpu.device import interp as dinterp
    from raptor_tpu.ruge_stuben import interpolation as it

    def boom(*a, **k):
        raise RuntimeError("synthetic device failure")

    monkeypatch.setattr(dinterp, "extended_interp_device", boom)
    monkeypatch.setattr(dinterp, "mod_classical_interp_device", boom)
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (16, 16), 1)
    s = strength(A, StrengthType.Classical, 0.25, 1, None)
    states = np.asarray(cf.split_pmis(s, form_rand_weights(
        A.global_num_rows, 0)))
    for kind in ("extended", "mod_classical"):
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            dispatch = (it._extended_dispatch if kind == "extended"
                        else it._mod_classical_dispatch)
            p = dispatch(A.global_csr, s.global_csr, states, 1, None,
                         "device", A.nnz)
        assert p.nnz > 0
        assert any("host kernel" in str(w.message) for w in rec)


def test_split_pattern_rectangular():
    """Native split_pattern sizes col_ptr by n_cols (rectangular S)."""
    import scipy.sparse as sp
    m = sp.random(30, 50, density=0.2, random_state=1, format="csr")
    m.sort_indices()
    ip, ix, cp, ci = native.split_pattern(m.indptr, m.indices, 30, 50)
    mt = sp.csr_matrix((np.ones(len(ix)), ix, ip), shape=(30, 50)).tocsc()
    mt.sort_indices()
    assert np.array_equal(cp, mt.indptr.astype(np.int64))
    assert np.array_equal(ci, mt.indices.astype(np.int64))


def test_both_device_engines_compose():
    """interp_mode='device' + rap_mode='device' in ONE setup: the fully
    on-device setup path builds a hierarchy that converges like host."""
    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (40, 40), 1)
    b = A.mult(np.ones(A.global_num_rows))
    iters = {}
    for mode in ("host", "device"):
        ml = ParRugeStubenSolver(0.25, CoarsenType.PMIS,
                                 InterpType.Extended)
        ml.interp_mode = mode
        ml.rap_mode = mode
        ml.setup(A)
        dh = DeviceHierarchy(ml, dpar.make_mesh(1))
        r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
        iters[mode] = int(r.n_iters)
    assert abs(iters["device"] - iters["host"]) <= 2


def test_par_interpolation_engine_fallback():
    """Multi-variable systems route back to the host kernel (device path
    is single-variable only)."""
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (16, 16), 1)
    w = form_rand_weights(A.global_num_rows, 0)
    s = strength(A, StrengthType.Classical, 0.25, 1, None)
    states = np.asarray(cf.split_pmis(s, w))
    variables = (np.arange(A.global_num_rows) % 2).astype(np.int64)
    p_dev = par_interpolation(A, s, states, "extended", 2, variables,
                              engine="device")
    p_host = par_interpolation(A, s, states, "extended", 2, variables,
                               engine="host")
    assert np.array_equal(p_dev.global_csr.indices,
                          p_host.global_csr.indices)
    np.testing.assert_allclose(p_dev.global_csr.data,
                               p_host.global_csr.data, atol=1e-14)
