"""Topology-aware (TAPComm-equivalent) halo exchange tests.

Mirrors core/tests/test_tap_comm.cpp and util/tests/test_tap_spmv_*.cpp:
TAP results must equal the plain exchange, and the deduplicated inter-host
(DCN) traffic must not exceed the plain schedule's."""

import numpy as np
import pytest

from raptor_tpu.comm.tap import build_tap_plan, device_put_tap
from raptor_tpu.core.par_matrix import par_matrix_from_scipy
from raptor_tpu.device import par as dpar
from raptor_tpu.device.tap_ops import tap_spmv, tap_spmv_T
from raptor_tpu.gallery.io import read_pm
from raptor_tpu.gallery.stencils import (
    diffusion_stencil_2d, laplace_stencil_27pt, par_stencil_grid)


def _matrices(test_data, n_shards):
    return {
        "aniso": par_stencil_grid(
            diffusion_stencil_2d(0.001, np.pi / 8), (25, 25), n_shards),
        "laplacian27": par_stencil_grid(
            laplace_stencil_27pt(), (10, 10, 10), n_shards),
        "random": par_matrix_from_scipy(
            read_pm(test_data / "random.pm").to_scipy(), n_shards),
    }


@pytest.mark.parametrize("hl", [(2, 4), (4, 2), (8, 1), (1, 8)])
@pytest.mark.parametrize("name", ["aniso", "laplacian27", "random"])
def test_tap_spmv_matches_golden(test_data, hl, name):
    H, L = hl
    A = _matrices(test_data, H * L)[name]
    mesh = dpar.make_mesh2(H, L)
    dA = dpar.device_put_matrix(A, mesh)
    plan = build_tap_plan(A, H, L)
    dT = device_put_tap(plan, mesh)
    part = A.partition

    xh = np.arange(A.global_num_cols, dtype=np.float64)
    x = dpar.device_put_vector(xh, part.col_bounds, dA.cols_pad, mesh)
    b = tap_spmv(mesh, dA, dT, x)
    golden = np.loadtxt(test_data / f"{name}_inc_b.txt")
    np.testing.assert_allclose(
        dpar.host_vector(np.asarray(b), part.row_bounds), golden, atol=1e-6)

    xr = dpar.device_put_vector(
        np.arange(A.global_num_rows, dtype=np.float64), part.row_bounds,
        dA.rows_pad, mesh)
    bt = tap_spmv_T(mesh, dA, dT, xr)
    golden_t = np.loadtxt(test_data / f"{name}_inc_b_T.txt")
    np.testing.assert_allclose(
        dpar.host_vector(np.asarray(bt), part.col_bounds), golden_t,
        atol=1e-6)


def test_tap_reduces_dcn_traffic(test_data):
    """The whole point of TAP: deduplicated values crossing hosts
    (arXiv:1612.08060)."""
    A = _matrices(test_data, 8)["random"]
    plan = build_tap_plan(A, 2, 4)
    assert plan.dcn_values <= plan.dcn_values_plain
    # random matrix halo cols are shared between a host's shards: must dedup
    assert plan.dcn_values < plan.dcn_values_plain
