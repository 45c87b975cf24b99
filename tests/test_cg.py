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


def test_mixed_precision_pcg():
    """f64 Krylov loop + f32 AMG preconditioner (the pack casts): reaches
    double-precision tolerances the f32 hierarchy alone cannot."""
    import jax.numpy as jnp

    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (40, 40), 4)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.Chebyshev)
    ml.num_smooth_sweeps = 3
    ml.setup(A)
    mesh = dpar.make_mesh(4)
    dh32 = DeviceHierarchy(ml, mesh, dtype=jnp.float32)
    dA64 = dpar.device_put_matrix(A, mesh, dtype=jnp.float64)
    b = A.mult(np.ones(A.global_num_rows))
    x0 = dpar.device_put_vector(np.zeros_like(b), A.partition.row_bounds,
                                dA64.rows_pad, mesh, dtype=jnp.float64)
    bb = dpar.device_put_vector(b, A.partition.row_bounds, dA64.rows_pad,
                                mesh, dtype=jnp.float64)
    r = cg(mesh, dA64, x0, bb, tol=1e-11, max_iter=200,
           precond=dh32.precond_pack())
    it = int(r.n_iters)
    assert it < 60
    assert float(r.res[it]) < 1e-11


def test_pcg_time_split():
    """comm_t/precond_t per-iteration splits (par_cg.cpp:121-239
    out-params), measured by chained timing."""
    import jax.numpy as jnp

    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.krylov.profile import pcg_time_split
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (40, 40),
                         4)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.Chebyshev)
    ml.num_smooth_sweeps = 2
    ml.setup(A)
    mesh = dpar.make_mesh(4)
    dh = DeviceHierarchy(ml, mesh)
    dA = dpar.device_put_matrix(A, mesh, need_transpose=False)
    b = dpar.device_put_vector(A.mult(np.ones(A.global_num_rows)),
                               A.partition.row_bounds, dA.rows_pad, mesh)
    split = pcg_time_split(mesh, dA, b, precond=dh.precond_pack())
    assert set(split) == {"total_t", "spmv_t", "comm_t", "precond_t"}
    assert split["total_t"] > 0 and split["precond_t"] > 0
    # the preconditioner application dominates a PCG iteration
    assert split["precond_t"] > split["spmv_t"]
