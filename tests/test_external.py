"""External-ecosystem interop (external/hypre_wrapper.cpp,
petsc_wrapper.cpp analogs): torch sparse converters + raptor_tpu AMG as
a scipy-Krylov preconditioner."""

import numpy as np
import pytest

from raptor_tpu.external import (amg_preconditioner, from_torch,
                                 solve_external, to_torch)
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, \
    par_stencil_grid, stencil_grid


def test_torch_round_trip():
    torch = pytest.importorskip("torch")
    a = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (17, 19))
    t = to_torch(a)
    assert t.layout == torch.sparse_csr
    x = np.random.default_rng(0).random(a.n_cols)
    y_t = (t @ torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y_t, a.mult(x), rtol=1e-11, atol=1e-13)
    back = from_torch(t)
    np.testing.assert_array_equal(back.indptr, a.indptr)
    np.testing.assert_array_equal(back.indices, a.indices)
    np.testing.assert_array_equal(back.data, a.data)


def test_amg_preconditioned_external_cg():
    from raptor_tpu.core.types import RelaxType
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                         (40, 40), 1)
    # scipy cg needs a SYMMETRIC M: SSOR-smoothed V-cycle (SOR's
    # one-directional sweeps make M nonsymmetric and cg stalls)
    ml = ParRugeStubenSolver(0.25, relax_type=RelaxType.SSOR)
    ml.setup(A)
    b = A.mult(np.ones(A.global_num_rows))
    x, info, iters = solve_external(ml, b, solver="cg", tol=1e-10)
    assert info == 0
    r = np.linalg.norm(b - A.mult(x)) / np.linalg.norm(b)
    assert r < 1e-9
    # AMG preconditioning must actually help: plain CG on this aniso
    # operator needs far more than 30 iterations
    assert iters < 30, iters
    # the preconditioner alone reduces the residual
    M = amg_preconditioner(ml)
    e = M @ b
    assert np.linalg.norm(b - A.mult(e)) < np.linalg.norm(b)
