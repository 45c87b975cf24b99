"""Smoothed-aggregation pipeline vs sas_* goldens
(aggregation/tests/test_par_smoothed_aggregation.cpp)."""

import numpy as np
import pytest

from raptor_tpu.aggregation.aggregate import aggregate
from raptor_tpu.aggregation.candidates import fit_candidates
from raptor_tpu.aggregation.mis import mis2
from raptor_tpu.aggregation.prolongation import jacobi_prolongation
from raptor_tpu.core.matrix import compare
from raptor_tpu.core.types import StrengthType
from raptor_tpu.gallery.io import read_pm
from raptor_tpu.ruge_stuben.strength import strength


@pytest.fixture(scope="module")
def weights(test_data):
    return np.loadtxt(test_data / "weights.txt")


def _drop_empty_cols_pattern(m):
    sp_m = m.to_scipy().tocsc()
    keep = np.diff(sp_m.indptr) > 0
    return sp_m[:, keep].tocsr()


@pytest.mark.parametrize("level", [0, 1])
def test_sa_pipeline_golden(test_data, weights, level):
    a = read_pm(test_data / f"sas_A{level}.pm")
    n = a.n_rows
    w = weights[:n]

    # strength: pattern comparison after removing empty cols
    # (test_par_smoothed_aggregation.cpp:84-86)
    s = strength(a, StrengthType.Symmetric, 0.25)
    s_py = read_pm(test_data / f"sas_S{level}.pm")
    m1 = _drop_empty_cols_pattern(s)
    m2 = _drop_empty_cols_pattern(s_py)
    assert np.array_equal(m1.indptr, m2.indptr)
    assert np.array_equal(m1.indices, m2.indices)

    # MIS2
    states = mis2(s, w)
    golden_mis = np.loadtxt(test_data / f"sas_mis{level}.txt", dtype=np.int64)
    np.testing.assert_array_equal(states, golden_mis)

    # aggregates
    n_aggs, aggs = aggregate(a, s, states, w)
    golden_agg = np.loadtxt(test_data / f"sas_agg{level}.txt", dtype=np.int64)
    np.testing.assert_array_equal(aggs, golden_agg)

    # tentative prolongator
    t, r = fit_candidates(n_aggs, aggs, np.ones(n))
    compare(t, read_pm(test_data / f"sas_T{level}.pm"))

    # smoothed prolongator
    p = jacobi_prolongation(a, t)
    compare(p, read_pm(test_data / f"sas_P{level}.pm"))

    # coarse operator
    if level == 0:
        ap = a.multiply(p)
        ac = p.transpose().to_scipy() @ ap.to_scipy()
        from raptor_tpu.core.matrix import CSRMatrix
        from raptor_tpu.core.types import ZERO_TOL
        ac = CSRMatrix.from_scipy(ac.tocsr()).canonicalize().drop(ZERO_TOL)
        compare(ac, read_pm(test_data / "sas_A1.pm"))


def test_sa_solver_converges():
    """Full SA solver on the aniso problem, device solve."""
    from raptor_tpu.aggregation.solver import ParSmoothedAggregationSolver
    from raptor_tpu.device import par as dpar
    from raptor_tpu.gallery.stencils import (
        diffusion_stencil_2d, par_stencil_grid)
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (25, 25), 4)
    ml = ParSmoothedAggregationSolver(0.25)
    ml.setup(A)
    assert ml.num_levels >= 2
    mesh = dpar.make_mesh(4)
    dh = DeviceHierarchy(ml, mesh)
    bh = A.mult(np.ones(A.global_num_rows))
    result = dh.solve(dh.vector(np.zeros_like(bh)), dh.vector(bh))
    iters = int(result.n_iters)
    assert iters < ml.max_iterations
    assert float(result.res[iters]) < ml.solve_tol
