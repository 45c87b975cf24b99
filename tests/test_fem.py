"""FE problem gallery (gallery/fem.py) — the MFEM-wrapper equivalent
(reference external/mfem/mfem_linear_elasticity.cpp, mfem_laplacian.cpp):
assembly sanity (SPD, symmetry, patch test) and an unknown-based AMG
solve of the elasticity system."""

import numpy as np
import pytest

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.fem import (par_fem, q1_laplacian,
                                    q1_linear_elasticity)
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def test_q1_laplacian_spd_and_symmetric():
    K = q1_laplacian(12, 12).to_scipy()
    assert (abs(K - K.T) > 1e-12).nnz == 0
    w = np.linalg.eigvalsh(K.todense())
    assert w.min() > 0


def test_q1_laplacian_matches_9pt_fe_stencil():
    # On a uniform square grid the Q1 FE Laplacian is the classical
    # 9-point stencil 1/3 * [[-1,-1,-1],[-1,8,-1],[-1,-1,-1]].
    n = 8
    K = q1_laplacian(n, n).to_scipy() * (1.0)  # h cancels in 2-D
    # interior row of an interior node
    nn = n - 1
    mid = (nn // 2) * nn + nn // 2
    row = K.getrow(mid)
    vals = sorted(np.round(row.data * 3, 10))
    assert vals == [-1, -1, -1, -1, -1, -1, -1, -1, 8]


def test_q1_elasticity_spd_rigid_body():
    K, variables = q1_linear_elasticity(8, 8)
    Kd = np.asarray(K.to_scipy().todense())
    assert np.allclose(Kd, Kd.T, atol=1e-12)
    w = np.linalg.eigvalsh(Kd)
    # clamped edge removes rigid-body modes -> strictly positive
    assert w.min() > 0
    assert set(np.unique(variables)) == {0, 1}


@pytest.mark.parametrize("n_shards", [1, 4])
def test_elasticity_systems_amg(n_shards):
    A, variables = par_fem("elasticity", 24, 24, n_shards)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.SOR)
    ml.num_variables = 2
    ml.variables = variables
    ml.setup(A)
    dh = DeviceHierarchy(ml, dpar.make_mesh(n_shards))
    b = A.mult(np.ones(A.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
    it = int(r.n_iters)
    assert it < ml.max_iterations
    assert float(r.res[it]) < ml.solve_tol


def test_shard_invariance():
    A1 = par_fem("laplace", 16, 16, 1)
    A4 = par_fem("laplace", 16, 16, 4)
    x = np.random.default_rng(0).random(A1.global_num_cols)
    np.testing.assert_allclose(A1.mult(x), A4.mult(x), atol=1e-14)
