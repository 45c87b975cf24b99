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


# --- the remaining MFEM problems (mfem_wrapper.hpp:15-45) ---------------------

import pytest


@pytest.mark.parametrize("kind,shape", [
    ("dg_diffusion", (10, 8)), ("dg_elasticity", (8, 6)),
    ("grad_div", (12, 10)), ("adaptive_laplacian", (16, 1))])
def test_fem_gallery_spd(kind, shape):
    """Every gallery operator is symmetric positive definite."""
    from raptor_tpu.gallery.fem import par_fem
    out = par_fem(kind, shape[0], shape[1], 1)
    A = out[0] if isinstance(out, tuple) else out
    m = A.global_csr.to_scipy()
    assert abs(m - m.T).max() < 1e-12
    rng = np.random.default_rng(3)
    for _ in range(3):
        v = rng.standard_normal(m.shape[0])
        assert v @ (m @ v) > 0


def test_dg_diffusion_manufactured():
    """SIPG DG diffusion reproduces u = sin(pi x) sin(pi y) at 2nd
    order (errors quarter per refinement)."""
    import scipy.sparse.linalg as spl

    from raptor_tpu.gallery.dg import _GP, _q1_shape, dg_diffusion
    errs = []
    for nx in (8, 16):
        K = dg_diffusion(nx, nx).to_scipy()
        hx = 1.0 / nx
        f = np.zeros(K.shape[0])
        for iy in range(nx):
            for ix in range(nx):
                base = 4 * (iy * nx + ix)
                for xi in _GP:
                    for eta in _GP:
                        x, y = (ix + xi) * hx, (iy + eta) * hx
                        nsh, _, _ = _q1_shape(xi, eta)
                        f[base:base + 4] += (
                            0.25 * hx * hx * nsh * 2 * np.pi ** 2
                            * np.sin(np.pi * x) * np.sin(np.pi * y))
        u = spl.spsolve(K.tocsc(), f)
        err = 0.0
        for iy in range(nx):
            for ix in range(nx):
                base = 4 * (iy * nx + ix)
                for xi in _GP:
                    for eta in _GP:
                        x, y = (ix + xi) * hx, (iy + eta) * hx
                        nsh, _, _ = _q1_shape(xi, eta)
                        uh = nsh @ u[base:base + 4]
                        err += 0.25 * hx * hx * (
                            uh - np.sin(np.pi * x)
                            * np.sin(np.pi * y)) ** 2
        errs.append(np.sqrt(err))
    assert errs[1] < 0.35 * errs[0]


@pytest.mark.parametrize("kind,shape", [
    ("dg_diffusion", (12, 10)), ("grad_div", (16, 12)),
    ("adaptive_laplacian", (16, 1))])
def test_fem_gallery_amg_solves(kind, shape):
    """AMG-preconditioned CG converges on each new gallery problem."""
    import jax.numpy as jnp

    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.device import par as dpar
    from raptor_tpu.gallery.fem import par_fem
    from raptor_tpu.krylov.cg import cg
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    out = par_fem(kind, shape[0], shape[1], 4)
    A = out[0] if isinstance(out, tuple) else out
    ml = ParRugeStubenSolver(0.25, CoarsenType.RS,
                             InterpType.ModClassical,
                             relax_type=RelaxType.Chebyshev)
    ml.num_smooth_sweeps = 2
    ml.setup(A)
    mesh = dpar.make_mesh(4)
    dh = DeviceHierarchy(ml, mesh, dtype=jnp.float64)
    dA = dpar.device_put_matrix(A, mesh, need_transpose=False)
    b = A.mult(np.ones(A.global_num_rows))
    x0 = dpar.device_put_vector(np.zeros_like(b), A.partition.row_bounds,
                                dA.rows_pad, mesh)
    bb = dpar.device_put_vector(b, A.partition.row_bounds, dA.rows_pad,
                                mesh)
    r = cg(mesh, dA, x0, bb, tol=1e-8, max_iter=200,
           precond=dh.precond_pack())
    it = int(r.n_iters)
    assert it < 120
    assert float(r.res[it]) < 1e-8
