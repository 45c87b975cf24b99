"""Hierarchy checkpoint/resume + unknown-based (num_variables>1) systems."""

import numpy as np

from raptor_tpu.core.types import CoarsenType, InterpType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.checkpoint import load_hierarchy, save_hierarchy
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def test_checkpoint_roundtrip(tmp_path):
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (25, 25), 4)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP, InterpType.ModClassical)
    ml.setup(A)
    save_hierarchy(ml, tmp_path / "ckpt")
    ml2 = load_hierarchy(tmp_path / "ckpt")
    assert ml2.num_levels == ml.num_levels
    for l1, l2 in zip(ml.levels, ml2.levels):
        assert l1.A.nnz == l2.A.nnz

    # the restored hierarchy must solve identically
    mesh = dpar.make_mesh(4)
    bh = A.mult(np.ones(A.global_num_rows))
    r1 = DeviceHierarchy(ml, mesh).solve(
        DeviceHierarchy(ml, mesh).vector(np.zeros_like(bh)),
        DeviceHierarchy(ml, mesh).vector(bh))
    dh2 = DeviceHierarchy(ml2, mesh)
    r2 = dh2.solve(dh2.vector(np.zeros_like(bh)), dh2.vector(bh))
    assert int(r1.n_iters) == int(r2.n_iters)
    np.testing.assert_allclose(np.asarray(r1.res), np.asarray(r2.res),
                               rtol=1e-10)


def test_unknown_based_strength_and_interp():
    """num_variables>1 (systems AMG): per-variable strength filtering
    (par_strength.cpp:14-346) and variable-matched interpolation
    (interpolation.cpp:206, test_hypre_unknown.cpp equivalent)."""
    from raptor_tpu.ruge_stuben.cf_splitting import split_rs_entry
    from raptor_tpu.ruge_stuben.interpolation import (
        mod_classical_interpolation)
    from raptor_tpu.ruge_stuben.strength import strength
    import scipy.sparse as sp
    from raptor_tpu.core.matrix import CSRMatrix

    # 2-variable system: block-interleaved 2x scalar Laplacians + weak
    # cross-variable coupling
    from raptor_tpu.gallery.stencils import stencil_grid
    lap = stencil_grid(diffusion_stencil_2d(1.0, 0.0), (10, 10)).to_scipy()
    n = lap.shape[0]
    A = sp.kron(lap, sp.eye(2)).tocsr()  # interleave variables
    cross = sp.kron(sp.eye(n), sp.csr_matrix([[0, 0.01], [0.01, 0]]))
    A = (A + cross).tocsr()
    a = CSRMatrix.from_scipy(A)
    variables = np.tile([0, 1], n)

    s = strength(a, theta=0.25, num_variables=2, variables=variables)
    # strength must never pick cross-variable off-diagonals
    scoo = s.to_scipy().tocoo()
    offd = scoo.row != scoo.col
    assert np.all(variables[scoo.row[offd]] == variables[scoo.col[offd]])

    states = split_rs_entry(s)
    p = mod_classical_interpolation(a, s, states, num_variables=2,
                                    variables=variables)
    assert p.n_cols == int((states == 1).sum())
    # interpolation rows sum to ~1 for F rows of an M-matrix-like system
    rs = np.asarray(p.to_scipy().sum(axis=1)).ravel()
    assert np.all(np.isfinite(rs))
