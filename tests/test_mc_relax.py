"""Multicolor Gauss-Seidel smoother (TPU-native addition)."""

import numpy as np
import pytest

from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.device.relax import build_relax, relax
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid


@pytest.mark.parametrize("kind", ["mc_sor", "mc_ssor"])
def test_mc_relax_smooths(kind):
    A = par_stencil_grid(diffusion_stencil_2d(1.0, 0.0), (20, 20), 4)
    mesh = dpar.make_mesh(4)
    dA = dpar.device_put_matrix(A, mesh)
    dRX = build_relax(A, mesh, dA)
    # 9-pt stencil needs exactly 4 colors
    assert dRX.n_colors <= 6
    part = A.partition
    rng = np.random.default_rng(7)
    xh = rng.standard_normal(A.global_num_rows)
    x = dpar.device_put_vector(xh, part.row_bounds, dA.rows_pad, mesh)
    b = dpar.device_put_vector(np.zeros_like(xh), part.row_bounds,
                               dA.rows_pad, mesh)
    out = relax(mesh, kind, dA, dRX, x, b, num_sweeps=10, omega=1.0)
    err = np.linalg.norm(dpar.host_vector(out, part.row_bounds))
    assert err < 0.3 * np.linalg.norm(xh)


def test_amg_with_mc_smoother():
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (25, 25), 4)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP, InterpType.ModClassical,
                             relax_type=RelaxType.MCSOR)
    ml.setup(A)
    mesh = dpar.make_mesh(4)
    dh = DeviceHierarchy(ml, mesh)
    bh = A.mult(np.ones(A.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(bh)), dh.vector(bh))
    iters = int(r.n_iters)
    assert iters < ml.max_iterations
    assert iters <= 30
    assert float(r.res[iters]) < ml.solve_tol
