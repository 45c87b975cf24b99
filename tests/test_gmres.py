"""Restarted GMRES(m) (krylov/gmres.py — beyond-reference breadth; the
reference stops at CG/BiCGStab)."""

import numpy as np
import pytest

from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                         par_stencil_grid, stencil_grid)
from raptor_tpu.krylov.gmres import gmres


def _convdiff(n, n_shards):
    """Upwind convection-diffusion: nonsymmetric, diagonally dominant."""
    st = np.array([[0.0, -1.0, 0.0],
                   [-1.8, 5.0, -0.2],
                   [0.0, -1.0, 0.0]])
    return par_stencil_grid(st, (n, n), n_shards)


def _vectors(A, dA, mesh):
    bh = A.mult(np.ones(A.global_num_rows))
    x = dpar.device_put_vector(np.zeros_like(bh), A.partition.row_bounds,
                               dA.rows_pad, mesh)
    b = dpar.device_put_vector(bh, A.partition.row_bounds, dA.rows_pad,
                               mesh)
    return bh, x, b


@pytest.mark.parametrize("n_shards", [1, 4])
def test_gmres_nonsymmetric(n_shards):
    A = _convdiff(40, n_shards)
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    bh, x, b = _vectors(A, dA, mesh)
    r = gmres(mesh, dA, x, b, tol=1e-8, restart=30)
    xh = dpar.host_vector(r.x, A.partition.row_bounds)
    rel = np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh)
    assert rel < 1e-7, rel
    # residual estimate history is monotone within machine slack
    n = int(r.n_iters) + 1
    res = np.asarray(r.res[:n])
    assert res[-1] <= 1e-7
    assert np.all(np.diff(res) <= 1e-12)


def test_gmres_small_restart_converges():
    A = _convdiff(30, 1)
    mesh = dpar.make_mesh(1)
    dA = dpar.device_put_matrix(A, mesh)
    bh, x, b = _vectors(A, dA, mesh)
    r = gmres(mesh, dA, x, b, tol=1e-8, restart=5)
    xh = dpar.host_vector(r.x, A.partition.row_bounds)
    assert np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh) < 1e-7


def test_gmres_scipy_residual_parity():
    """Cross-implementation oracle: plain GMRES minimizes ||b - A x||
    over the same Krylov space regardless of implementation, so the
    per-iteration residual history must match scipy.sparse.linalg.gmres
    (same restart, x0 = 0) to roundoff. CGS2 here vs scipy's MGS only
    changes the rounding, not the math."""
    import scipy.sparse.linalg as spla

    A = _convdiff(40, 1)
    mesh = dpar.make_mesh(1)
    dA = dpar.device_put_matrix(A, mesh)
    bh, x, b = _vectors(A, dA, mesh)

    r = gmres(mesh, dA, x, b, tol=1e-8, restart=30)
    n = int(r.n_iters) + 1
    mine = np.asarray(r.res[:n])          # res[k] = ||r_k|| / ||b||

    hist = []
    spla.gmres(A.global_csr.to_scipy(), bh, rtol=1e-8, atol=0.0,
               restart=30, callback=lambda pr: hist.append(float(pr)),
               callback_type="pr_norm")
    theirs = np.asarray([1.0] + hist)     # x0=0: r_0 = b

    k = min(len(mine), len(theirs))
    assert k > 5
    np.testing.assert_allclose(mine[:k], theirs[:k], rtol=1e-6,
                               atol=1e-12)


def test_gmres_scipy_amg_preconditioned_iters():
    """Same AMG hierarchy as M on both sides: this gmres (right
    preconditioning) vs scipy's (left). The norms minimized differ, so
    histories are not comparable point-for-point — but the
    preconditioner quality is the same object, so iteration counts to
    1e-8 must land within a few iterations of each other."""
    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.external import solve_external
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (50, 50), 1)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.SOR)
    ml.setup(A)
    mesh = dpar.make_mesh(1)
    dh = DeviceHierarchy(ml, mesh)
    dA = dpar.device_put_matrix(A, mesh)
    bh, x, b = _vectors(A, dA, mesh)

    mine = gmres(mesh, dA, x, b, tol=1e-8, restart=30, max_iter=100,
                 precond=dh.precond_pack())
    xh = dpar.host_vector(mine.x, A.partition.row_bounds)
    assert np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh) < 1e-7

    xs, info, iters_scipy = solve_external(ml, bh, "gmres", tol=1e-8,
                                           maxiter=100)
    assert info == 0
    assert abs(int(mine.n_iters) - iters_scipy) <= 4, \
        (int(mine.n_iters), iters_scipy)


def test_gmres_amg_preconditioned():
    """AMG-preconditioned GMRES beats plain by a wide margin on the
    anisotropic problem (same pack as PCG)."""
    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (50, 50), 4)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.SOR)
    ml.setup(A)
    mesh = dpar.make_mesh(4)
    dh = DeviceHierarchy(ml, mesh)
    dA = dpar.device_put_matrix(A, mesh)
    bh, x, b = _vectors(A, dA, mesh)

    plain = gmres(mesh, dA, x, b, tol=1e-8, restart=30, max_iter=400)
    pre = gmres(mesh, dA, x, b, tol=1e-8, restart=30, max_iter=400,
                precond=dh.precond_pack())
    assert int(pre.n_iters) < int(plain.n_iters) / 3, \
        (int(pre.n_iters), int(plain.n_iters))
    xh = dpar.host_vector(pre.x, A.partition.row_bounds)
    assert np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh) < 1e-7
