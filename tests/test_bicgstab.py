"""BiCGStab vs golden residual history (krylov/tests/test_par_bicgstab.cpp:
50x50 aniso, b = A*1, x0 = 0, first 10 absolute residuals to 1e-6) and the
reproducibility variants (test_bicgstab_reproducibility.cpp)."""

import numpy as np
import pytest

from raptor_tpu.device import par as dpar
from raptor_tpu.krylov.bicgstab import (
    bicgstab, pi_bicgstab, seq_inner_bicgstab, seq_inner_seq_norm_bicgstab,
    seq_norm_bicgstab)
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid


def _system(n_shards):
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (50, 50),
                         n_shards)
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    bh = A.mult(np.ones(A.global_num_rows))
    x = dpar.device_put_vector(np.zeros_like(bh), A.partition.row_bounds,
                               dA.rows_pad, mesh)
    b = dpar.device_put_vector(bh, A.partition.row_bounds, dA.rows_pad, mesh)
    return A, mesh, dA, x, b, bh


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_bicgstab_golden(test_data, n_shards):
    """Full-history check against bicgstab_res.txt. BiCGStab
    trajectories are chaotically sensitive to FP summation order (the
    reference ships a reproducibility STUDY for exactly this,
    test_bicgstab_reproducibility.cpp) — ours tracks the golden to
    ~1e-12 for the first ~30 iterations, after which trajectories
    diverge while both converge. Asserted: exact early history (30
    iters, the deterministic window), convergence within the golden
    trajectory's length, and the solution itself."""
    A, mesh, dA, x, b, bh = _system(n_shards)
    result = bicgstab(mesh, dA, x, b)
    golden = np.loadtxt(test_data / "bicgstab_res.txt")
    res = np.asarray(result.res)
    np.testing.assert_allclose(res[:30], golden[:30], rtol=1e-4,
                               atol=1e-10)
    np.testing.assert_allclose(res[:10], golden[:10], rtol=1e-10)
    # converges within ~15% of the golden trajectory's length (shard
    # count perturbs the psum ordering, hence the trajectory: 94 iters
    # at 1 shard, 108 at 8, golden 104)
    assert int(result.n_iters) <= int(1.15 * len(golden))
    # converged solution solves the system
    xh = dpar.host_vector(result.x, A.partition.row_bounds)
    assert (np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh) < 1e-5)


@pytest.mark.parametrize("variant", [
    seq_inner_bicgstab, seq_norm_bicgstab, seq_inner_seq_norm_bicgstab,
    pi_bicgstab])
def test_bicgstab_variants_converge(test_data, variant):
    A, mesh, dA, x, b, bh = _system(4)
    result = variant(mesh, dA, x, b)
    n = int(result.n_iters)
    assert n < int(1.3 * A.global_num_rows) + 2
    xh = dpar.host_vector(result.x, A.partition.row_bounds)
    assert (np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh) < 1e-4)


def _amg_hierarchy(n_shards=4):
    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    from raptor_tpu.core.types import RelaxType

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (25, 25),
                         n_shards)
    # SSOR: CG needs a symmetric preconditioner
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP, InterpType.ModClassical,
                             relax_type=RelaxType.SSOR)
    ml.setup(A)
    mesh = dpar.make_mesh(n_shards)
    dh = DeviceHierarchy(ml, mesh)
    return A, mesh, dh


def test_pre_bicgstab_with_amg():
    """Pre_BiCGStab (par_bicgstab.cpp:240): AMG V-cycle preconditioner."""
    from raptor_tpu.krylov.bicgstab import pre_bicgstab

    A, mesh, dh = _amg_hierarchy()
    bh = A.mult(np.ones(A.global_num_rows))
    result = pre_bicgstab(mesh, dh.levels[0].A, dh.vector(np.zeros_like(bh)),
                          dh.vector(bh), dh.precond_pack())
    assert int(result.n_iters) < 30
    xh = dh.host(result.x)
    assert np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh) < 1e-4


def test_pcg_with_amg():
    """PCG (par_cg.cpp:121-239): AMG-preconditioned CG converges much
    faster than plain CG."""
    from raptor_tpu.krylov.cg import cg

    A, mesh, dh = _amg_hierarchy()
    bh = A.mult(np.ones(A.global_num_rows))
    plain = cg(mesh, dh.levels[0].A, dh.vector(np.zeros_like(bh)),
               dh.vector(bh))
    pre = cg(mesh, dh.levels[0].A, dh.vector(np.zeros_like(bh)),
             dh.vector(bh), precond=dh.precond_pack())
    assert int(pre.n_iters) < int(plain.n_iters)
    assert int(pre.n_iters) < 20
    xh = dh.host(pre.x)
    assert np.linalg.norm(bh - A.mult(xh)) / np.linalg.norm(bh) < 1e-4
