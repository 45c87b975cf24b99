"""Gallery + IO golden tests.

Mirrors the reference's gallery/util tests: generated stencil matrices must
match the PyAMG-generated golden files in test_data/, and SpMV products must
match the golden right-hand sides (util/tests/test_par_spmv_*.cpp)."""

import numpy as np
import pytest

from raptor_tpu.core.matrix import compare
from raptor_tpu.gallery.io import read_pm, read_mm, write_pm, write_mm
from raptor_tpu.gallery.stencils import (
    diffusion_stencil_2d, laplace_stencil_27pt, stencil_grid)

ANISO_GRID = (25, 25)
ANISO_EPS, ANISO_THETA = 0.001, np.pi / 8.0
LAPL_GRID = (10, 10, 10)


def aniso_matrix():
    return stencil_grid(diffusion_stencil_2d(ANISO_EPS, ANISO_THETA),
                        ANISO_GRID)


def lapl_matrix():
    return stencil_grid(laplace_stencil_27pt(), LAPL_GRID)


def test_aniso_matches_golden_pm(test_data):
    compare(aniso_matrix(), read_pm(test_data / "aniso.pm"))


def test_aniso_mtx_matches_golden(test_data):
    # aniso.mtx is the theta=pi/4 variant of the same 25x25 stencil
    a = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 4.0), ANISO_GRID)
    compare(a, read_mm(test_data / "aniso.mtx"))


def test_laplacian27_matches_golden_pm(test_data):
    compare(lapl_matrix(), read_pm(test_data / "laplacian27.pm"))


@pytest.mark.parametrize("name,mat_fn", [
    ("aniso", aniso_matrix),
    ("laplacian27", lapl_matrix),
])
def test_spmv_golden(test_data, name, mat_fn):
    a = mat_fn()
    ones = np.ones(a.n_cols)
    inc = np.arange(a.n_cols, dtype=np.float64)
    for suffix, x, op in [
        ("_ones_b.txt", ones, a.mult),
        ("_ones_b_T.txt", ones, a.mult_T),
        ("_inc_b.txt", inc, a.mult),
        ("_inc_b_T.txt", inc, a.mult_T),
    ]:
        golden = np.loadtxt(test_data / (name + suffix))
        np.testing.assert_allclose(op(x), golden, atol=1e-6)


def test_random_spmv_golden(test_data):
    a = read_pm(test_data / "random.pm")
    ones = np.ones(a.n_cols)
    inc = np.arange(a.n_cols, dtype=np.float64)
    for suffix, x, op in [
        ("random_ones_b.txt", ones, a.mult),
        ("random_ones_b_T.txt", ones, a.mult_T),
        ("random_inc_b.txt", inc, a.mult),
        ("random_inc_b_T.txt", inc, a.mult_T),
    ]:
        golden = np.loadtxt(test_data / suffix)
        np.testing.assert_allclose(op(x), golden, atol=1e-6)


def test_pm_roundtrip(tmp_path):
    a = aniso_matrix()
    write_pm(tmp_path / "a.pm", a)
    compare(a, read_pm(tmp_path / "a.pm"), atol=0.0)


def test_mm_roundtrip(tmp_path):
    a = aniso_matrix()
    write_mm(tmp_path / "a.mtx", a)
    compare(a, read_mm(tmp_path / "a.mtx"), atol=1e-12)
