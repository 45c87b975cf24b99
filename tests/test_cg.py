"""CG vs the reference's golden residual history
(krylov/tests/test_par_cg.cpp: 50x50 aniso, b = A*1, x0 = 0)."""

import numpy as np
import pytest

from raptor_tpu.device import par as dpar
from raptor_tpu.krylov.cg import cg
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_cg_golden_residuals(test_data, n_shards):
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (50, 50),
                         n_shards)
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    part = A.partition

    bh = A.mult(np.ones(A.global_num_rows))
    b_norm = np.linalg.norm(bh)
    x = dpar.device_put_vector(np.zeros_like(bh), part.row_bounds,
                               dA.rows_pad, mesh)
    b = dpar.device_put_vector(bh, part.row_bounds, dA.rows_pad, mesh)

    result = cg(mesh, dA, x, b)
    golden = np.loadtxt(test_data / "cg_res.txt")
    n = int(result.n_iters) + 1
    res = np.asarray(result.res[:n]) * b_norm
    assert not bool(result.indefinite)
    assert n == len(golden), (n, len(golden))
    np.testing.assert_allclose(res, golden, atol=1e-6)

    # and the solution must actually solve the system
    xh = dpar.host_vector(result.x, part.row_bounds)
    assert np.linalg.norm(bh - A.mult(xh)) / b_norm < 1e-5
