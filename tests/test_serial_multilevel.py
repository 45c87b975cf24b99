"""Serial host solver vs the device solver at 1 shard: identical residual
histories (the hybrid smoother at 1 shard IS the sequential sweep)."""

import numpy as np

from raptor_tpu.core.types import CoarsenType, InterpType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
from raptor_tpu.multilevel.serial import SerialMultilevel


def test_serial_matches_device_1shard():
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (25, 25), 1)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP, InterpType.ModClassical)
    ml.setup(A)
    bh = A.mult(np.ones(A.global_num_rows))

    sx, sres, sit = SerialMultilevel(ml).solve(np.zeros_like(bh), bh)

    mesh = dpar.make_mesh(1)
    dh = DeviceHierarchy(ml, mesh)
    r = dh.solve(dh.vector(np.zeros_like(bh)), dh.vector(bh))

    assert int(r.n_iters) == sit
    # identical algorithm; tiny fp sum-order drift accumulates over cycles
    np.testing.assert_allclose(np.asarray(r.res[:sit + 1]), sres, rtol=1e-5)
    np.testing.assert_allclose(dh.host(r.x), sx, atol=1e-8)
