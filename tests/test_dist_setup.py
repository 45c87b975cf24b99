"""Distributed (per-shard + transport) setup stages vs the host-global
oracle: the algorithms in ruge_stuben/par_setup.py touch only shard
blocks and the transport primitives, and must produce identical results
for every shard count (the reference's rank-count invariance, exercised
like core/tests with 1/4/16 ranks)."""

import numpy as np
import pytest

from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.ruge_stuben import cf_splitting as cf
from raptor_tpu.ruge_stuben.par_setup import (
    dist_classical_strength, dist_split_pmis, strength_masks_to_par)
from raptor_tpu.ruge_stuben.strength import strength
from raptor_tpu.utils.glibc_rand import form_rand_weights


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_strength_matches_global(n_shards):
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (30, 30),
                         n_shards)
    masks = dist_classical_strength(A, theta=0.25)
    S_dist = strength_masks_to_par(A, masks).global_csr
    S_ref = strength(A, theta=0.25).global_csr
    assert np.array_equal(S_dist.indptr, S_ref.indptr)
    assert np.array_equal(S_dist.indices, S_ref.indices)
    np.testing.assert_allclose(S_dist.data, S_ref.data, atol=1e-14)


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_pmis_matches_global(n_shards):
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (30, 30),
                         n_shards)
    S = strength(A, theta=0.25)
    w = form_rand_weights(A.global_num_rows, 0)
    states_ref = cf.split_pmis(S, w)
    states_dist = dist_split_pmis(S, w)
    assert np.array_equal(states_dist, np.asarray(states_ref))


def test_dist_pmis_larger_problem():
    A = par_stencil_grid(diffusion_stencil_2d(1.0, 0.0), (64, 64), 8)
    S = strength(A, theta=0.25)
    w = form_rand_weights(A.global_num_rows, 0)
    states_ref = cf.split_pmis(S, w)
    states_dist = dist_split_pmis(S, w)
    assert np.array_equal(states_dist, np.asarray(states_ref))


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_direct_interpolation_matches_global(n_shards):
    from raptor_tpu.ruge_stuben.interpolation import direct_interpolation
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (30, 30),
                         n_shards)
    w = form_rand_weights(A.global_num_rows, 0)
    masks = dist_classical_strength(A, theta=0.25)
    S = strength_masks_to_par(A, masks)
    states = cf.split_pmis(S, w)
    from raptor_tpu.ruge_stuben.par_setup import dist_direct_interpolation
    P_dist = dist_direct_interpolation(A, masks, np.asarray(states))
    P_ref = direct_interpolation(A.global_csr, S.global_csr,
                                 np.asarray(states))
    assert np.array_equal(P_dist.indptr, P_ref.indptr)
    assert np.array_equal(P_dist.indices, P_ref.indices)
    np.testing.assert_allclose(P_dist.data, P_ref.data, atol=1e-13)


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_rap_matches_global(n_shards):
    from raptor_tpu.ruge_stuben.interpolation import direct_interpolation
    from raptor_tpu.ruge_stuben.par_setup import dist_rap
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (30, 30),
                         n_shards)
    w = form_rand_weights(A.global_num_rows, 0)
    S = strength(A, theta=0.25)
    states = cf.split_pmis(S, w)
    P = direct_interpolation(A.global_csr, S.global_csr,
                             np.asarray(states))
    C_dist = dist_rap(A, P)
    ap = A.global_csr.multiply(P)
    C_ref = P.transpose().multiply(ap)
    assert np.array_equal(C_dist.indptr, C_ref.indptr)
    assert np.array_equal(C_dist.indices, C_ref.indices)
    np.testing.assert_allclose(C_dist.data, C_ref.data, atol=1e-12)


@pytest.mark.parametrize("n_shards", [4, 8])
def test_dist_full_pipeline_hierarchy(n_shards):
    """Whole setup level chain through the distributed stages:
    strength -> PMIS -> direct P -> RAP, repeated until coarse, equal to
    the host-global pipeline at every level."""
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    from raptor_tpu.core.partition import Partition
    from raptor_tpu.ruge_stuben.interpolation import direct_interpolation
    from raptor_tpu.ruge_stuben.par_setup import (dist_direct_interpolation,
                                                  dist_rap)

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24),
                         n_shards)
    w = form_rand_weights(A.global_num_rows, 0)
    a_dist, a_ref = A, A.global_csr
    for _ in range(3):
        if a_ref.n_rows <= 40:
            break
        # distributed
        masks = dist_classical_strength(a_dist, theta=0.25)
        S_d = strength_masks_to_par(a_dist, masks)
        st_d = dist_split_pmis(S_d, w)
        P_d = dist_direct_interpolation(a_dist, masks, st_d)
        C_d = dist_rap(a_dist, P_d)
        # host-global oracle
        S_r = strength(ParCSRMatrix(a_ref,
                                    a_dist.partition), theta=0.25)
        st_r = cf.split_pmis(S_r, w)
        P_r = direct_interpolation(a_ref, S_r.global_csr,
                                   np.asarray(st_r))
        ap = a_ref.multiply(P_r)
        C_r = P_r.transpose().multiply(ap)
        assert np.array_equal(st_d, np.asarray(st_r))
        assert np.array_equal(C_d.indptr, C_r.indptr)
        assert np.array_equal(C_d.indices, C_r.indices)
        np.testing.assert_allclose(C_d.data, C_r.data, atol=1e-12)
        part = Partition.create(C_d.n_rows, C_d.n_cols, n_shards)
        a_dist = ParCSRMatrix(C_d, part)
        a_ref = C_r


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_cljp_matches_global(n_shards):
    from raptor_tpu.ruge_stuben.par_setup import dist_split_cljp
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (20, 20),
                         n_shards)
    S = strength(A, theta=0.25)
    w = form_rand_weights(A.global_num_rows, 0)
    states_ref = cf.split_cljp(S, w)
    states_dist = dist_split_cljp(S, w)
    assert np.array_equal(states_dist, np.asarray(states_ref))


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_mod_classical_matches_global(n_shards):
    from raptor_tpu.ruge_stuben.interpolation import (
        mod_classical_interpolation)
    from raptor_tpu.ruge_stuben.par_setup import (
        dist_mod_classical_interpolation, dist_split_cljp)
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24),
                         n_shards)
    S = strength(A, theta=0.25)
    w = form_rand_weights(A.global_num_rows, 0)
    states = np.asarray(cf.split_cljp(S, w))
    P_dist = dist_mod_classical_interpolation(A, S, states)
    P_ref = mod_classical_interpolation(A.global_csr, S.global_csr, states)
    assert np.array_equal(P_dist.indptr, P_ref.indptr)
    assert np.array_equal(P_dist.indices, P_ref.indices)
    np.testing.assert_allclose(P_dist.data, P_ref.data, atol=1e-13)


@pytest.mark.parametrize("n_shards", [4, 8])
def test_dist_canonical_pipeline(n_shards):
    """The canonical config (CLJP + ModClassical) through the distributed
    stages, chained over two levels, vs the host-global pipeline."""
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    from raptor_tpu.core.partition import Partition
    from raptor_tpu.ruge_stuben.interpolation import (
        mod_classical_interpolation)
    from raptor_tpu.ruge_stuben.par_setup import (
        dist_mod_classical_interpolation, dist_rap, dist_split_cljp)

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (20, 20),
                         n_shards)
    w = form_rand_weights(A.global_num_rows, 0)
    a_dist, a_ref = A, A.global_csr
    for _ in range(2):
        masks = dist_classical_strength(a_dist, theta=0.25)
        S_d = strength_masks_to_par(a_dist, masks)
        st_d = dist_split_cljp(S_d, w)
        P_d = dist_mod_classical_interpolation(a_dist, S_d, st_d)
        C_d = dist_rap(a_dist, P_d)

        S_r = strength(ParCSRMatrix(a_ref, a_dist.partition), theta=0.25)
        st_r = np.asarray(cf.split_cljp(S_r, w))
        P_r = mod_classical_interpolation(a_ref, S_r.global_csr, st_r)
        ap = a_ref.multiply(P_r)
        C_r = P_r.transpose().multiply(ap)

        assert np.array_equal(st_d, st_r)
        assert np.array_equal(C_d.indptr, C_r.indptr)
        assert np.array_equal(C_d.indices, C_r.indices)
        np.testing.assert_allclose(C_d.data, C_r.data, atol=1e-12)
        # chain BOTH paths on the distributed product: comparing two
        # pipelines on roundoff-different inputs is ill-posed (strength
        # thresholds are strict inequalities)
        part = Partition.create(C_d.n_rows, C_d.n_cols, n_shards)
        a_dist, a_ref = ParCSRMatrix(C_d, part), C_d


@pytest.mark.parametrize("n_shards", [1, 8])
def test_distributed_setup_mode_solves(n_shards):
    """setup_mode='distributed' builds a hierarchy through the per-shard
    stages; the device V-cycle solve converges like the global one."""
    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (40, 40),
                         n_shards)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical,
                             relax_type=RelaxType.SOR)
    ml.setup_mode = "distributed"
    ml.setup(A)
    assert ml.num_levels >= 3
    dh = DeviceHierarchy(ml, dpar.make_mesh(n_shards))
    b = A.mult(np.ones(A.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
    it = int(r.n_iters)
    assert it < ml.max_iterations
    assert float(r.res[it]) < ml.solve_tol


@pytest.mark.parametrize("n_shards", [1, 4, 8])
@pytest.mark.parametrize("split_name", ["pmis", "hmis", "cljp"])
def test_dist_extended_matches_global(n_shards, split_name):
    """Distributed extended+i (par_interpolation.cpp:301-1010): exact
    pattern + roundoff values vs the host-global oracle; fringe
    (distance-2) states/coarse ids travel via fetch_ids."""
    from raptor_tpu.ruge_stuben.interpolation import extended_interpolation
    from raptor_tpu.ruge_stuben.par_setup import dist_extended_interpolation
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24),
                         n_shards)
    S = strength(A, theta=0.25)
    w = form_rand_weights(A.global_num_rows, 0)
    split = {"pmis": cf.split_pmis, "hmis": cf.split_hmis,
             "cljp": cf.split_cljp}[split_name]
    states = np.asarray(split(S, w))
    P_dist = dist_extended_interpolation(A, S, states)
    P_ref = extended_interpolation(A.global_csr, S.global_csr, states)
    assert np.array_equal(P_dist.indptr, P_ref.indptr)
    assert np.array_equal(P_dist.indices, P_ref.indices)
    np.testing.assert_allclose(P_dist.data, P_ref.data, atol=1e-13)


@pytest.mark.parametrize("n_shards", [1, 8])
def test_distributed_setup_mode_hmis_extended_solves(n_shards):
    """The at-scale config (HMIS + Extended + filter) through
    setup_mode='distributed' — previously rejected by the dispatch."""
    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (40, 40),
                         n_shards)
    ml = ParRugeStubenSolver(0.25, CoarsenType.HMIS, InterpType.Extended,
                             relax_type=RelaxType.SOR)
    ml.setup_mode = "distributed"
    ml.setup(A)
    assert ml.num_levels >= 3
    dh = DeviceHierarchy(ml, dpar.make_mesh(n_shards))
    b = A.mult(np.ones(A.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
    it = int(r.n_iters)
    assert it < ml.max_iterations
    assert float(r.res[it]) < ml.solve_tol


def test_distributed_setup_mode_hmis_extended_matches_host_global():
    """At 1 shard the distributed HMIS+Extended hierarchy equals the
    host-global one level by level."""
    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (32, 32), 1)
    mlg = ParRugeStubenSolver(0.25, CoarsenType.HMIS, InterpType.Extended)
    mlg.setup(A)
    mld = ParRugeStubenSolver(0.25, CoarsenType.HMIS, InterpType.Extended)
    mld.setup_mode = "distributed"
    mld.setup(A)
    assert mld.num_levels == mlg.num_levels
    for lg, ld in zip(mlg.levels, mld.levels):
        ag, ad = lg.A.global_csr, ld.A.global_csr
        assert np.array_equal(ag.indptr, ad.indptr)
        assert np.array_equal(ag.indices, ad.indices)
        np.testing.assert_allclose(ag.data, ad.data, atol=1e-12)


def test_dist_falgout_hmis_single_shard_equals_global():
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24), 1)
    S = strength(A, theta=0.25)
    w = form_rand_weights(A.global_num_rows, 0)
    from raptor_tpu.ruge_stuben.par_setup import (dist_split_falgout,
                                                  dist_split_hmis)
    assert np.array_equal(dist_split_falgout(S, w),
                          np.asarray(cf.split_falgout(S, w)))
    assert np.array_equal(dist_split_hmis(S, w),
                          np.asarray(cf.split_hmis(S, w)))


@pytest.mark.parametrize("n_shards", [4, 8])
def test_dist_falgout_hmis_valid_splitting(n_shards):
    """Multi-shard Falgout/HMIS are partition-dependent (like the
    reference's rank-dependent hybrids); validate the CF invariants:
    every F point keeps a strong C neighbor in either direction."""
    from raptor_tpu.core.types import CFState
    from raptor_tpu.ruge_stuben.par_setup import (dist_split_falgout,
                                                  dist_split_hmis)
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (30, 30),
                         n_shards)
    S = strength(A, theta=0.25)
    w = form_rand_weights(A.global_num_rows, 0)
    g = S.global_csr.to_scipy()
    gT = g.T.tocsr()
    for fn in (dist_split_falgout, dist_split_hmis):
        st = fn(S, w)
        assert set(np.unique(st)) <= {int(CFState.Selected),
                                      int(CFState.Unselected),
                                      int(CFState.NoNeighbors)}
        sel = st == int(CFState.Selected)
        assert sel.sum() > 0
        for i in np.nonzero(st == int(CFState.Unselected))[0]:
            nb = np.concatenate([g.indices[g.indptr[i]:g.indptr[i + 1]],
                                 gT.indices[gT.indptr[i]:gT.indptr[i + 1]]])
            nb = nb[nb != i]
            assert sel[nb].any(), f"F point {i} has no C neighbor"


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_mis2_matches_global(n_shards):
    from raptor_tpu.aggregation.mis import mis2
    from raptor_tpu.ruge_stuben.par_setup import dist_mis2
    from raptor_tpu.ruge_stuben.strength import symmetric_strength
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24),
                         n_shards)
    S_g = symmetric_strength(A.global_csr, theta=0.25)
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    S = ParCSRMatrix(S_g, A.partition)
    w = form_rand_weights(A.global_num_rows, 0)
    st_ref = mis2(S_g, w)
    st_dist = dist_mis2(S, w)
    assert np.array_equal(st_dist, np.asarray(st_ref))


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_aggregate_matches_global(n_shards):
    from raptor_tpu.aggregation.aggregate import aggregate
    from raptor_tpu.aggregation.mis import mis2
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    from raptor_tpu.ruge_stuben.par_setup import dist_aggregate, dist_mis2
    from raptor_tpu.ruge_stuben.strength import symmetric_strength
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24),
                         n_shards)
    S_g = symmetric_strength(A.global_csr, theta=0.25)
    S = ParCSRMatrix(S_g, A.partition)
    w = form_rand_weights(A.global_num_rows, 0)
    st = np.asarray(mis2(S_g, w))
    n_ref, agg_ref = aggregate(A.global_csr, S_g, st, w)
    n_dist, agg_dist = dist_aggregate(A, S, st, w)
    assert n_ref == n_dist
    assert np.array_equal(agg_dist, agg_ref)


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_sa_pipeline_matches_global(n_shards):
    """SA stages distributed: MIS2 -> aggregate -> fit_candidates ->
    jacobi prolongation, vs the host-global pipeline."""
    from raptor_tpu.aggregation.aggregate import aggregate
    from raptor_tpu.aggregation.candidates import fit_candidates
    from raptor_tpu.aggregation.mis import mis2
    from raptor_tpu.aggregation.prolongation import jacobi_prolongation
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    from raptor_tpu.ruge_stuben.par_setup import (
        dist_aggregate, dist_fit_candidates, dist_jacobi_prolongation,
        dist_mis2)
    from raptor_tpu.ruge_stuben.strength import symmetric_strength

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (24, 24),
                         n_shards)
    S_g = symmetric_strength(A.global_csr, theta=0.25)
    S = ParCSRMatrix(S_g, A.partition)
    w = form_rand_weights(A.global_num_rows, 0)
    B = np.ones(A.global_num_rows)

    st = dist_mis2(S, w)
    n_aggs, aggs = dist_aggregate(A, S, st, w)
    T_d, R_d = dist_fit_candidates(A, n_aggs, aggs, B)
    P_d = dist_jacobi_prolongation(A, T_d)

    st_r = np.asarray(mis2(S_g, w))
    n_r, aggs_r = aggregate(A.global_csr, S_g, st_r, w)
    T_r, R_r = fit_candidates(n_r, aggs_r, B)
    P_r = jacobi_prolongation(A.global_csr, T_r)

    assert np.array_equal(st, st_r) and n_aggs == n_r
    assert np.array_equal(aggs, aggs_r)
    np.testing.assert_allclose(R_d, R_r, atol=1e-13)
    assert np.array_equal(T_d.indptr, T_r.indptr)
    assert np.array_equal(T_d.indices, T_r.indices)
    np.testing.assert_allclose(T_d.data, T_r.data, atol=1e-14)
    assert np.array_equal(P_d.indptr, P_r.indptr)
    assert np.array_equal(P_d.indices, P_r.indices)
    np.testing.assert_allclose(P_d.data, P_r.data, atol=1e-13)


@pytest.mark.parametrize("n_shards", [1, 8])
def test_distributed_sa_setup_mode_solves(n_shards):
    from raptor_tpu.aggregation.solver import ParSmoothedAggregationSolver
    from raptor_tpu.core.types import RelaxType
    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy

    A = par_stencil_grid(diffusion_stencil_2d(1.0, 0.0), (36, 36),
                         n_shards)
    ml = ParSmoothedAggregationSolver(strong_threshold=0.0,
                                      relax_type=RelaxType.SOR)
    ml.setup_mode = "distributed"
    ml.setup(A)
    assert ml.num_levels >= 2
    dh = DeviceHierarchy(ml, dpar.make_mesh(n_shards))
    b = A.mult(np.ones(A.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
    it = int(r.n_iters)
    assert it < ml.max_iterations
    assert float(r.res[it]) < ml.solve_tol


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_dist_symmetric_strength_matches_global(n_shards):
    from raptor_tpu.ruge_stuben.par_setup import dist_symmetric_strength
    from raptor_tpu.ruge_stuben.strength import symmetric_strength
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (30, 30),
                         n_shards)
    masks = dist_symmetric_strength(A, theta=0.25)
    S_dist = strength_masks_to_par(A, masks).global_csr
    S_ref = symmetric_strength(A.global_csr, theta=0.25)
    assert np.array_equal(S_dist.indptr, S_ref.indptr)
    assert np.array_equal(S_dist.indices, S_ref.indices)
    np.testing.assert_allclose(S_dist.data, S_ref.data, atol=1e-14)


def test_distributed_sa_hierarchy_matches_global():
    """SA setup_mode='distributed' (now including the RAP over the
    transport seam) equals the host-global hierarchy at 1 shard."""
    from raptor_tpu.aggregation.solver import ParSmoothedAggregationSolver

    A = par_stencil_grid(diffusion_stencil_2d(1.0, 0.0), (30, 30), 1)
    mlg = ParSmoothedAggregationSolver(strong_threshold=0.0)
    mlg.setup(A)
    mld = ParSmoothedAggregationSolver(strong_threshold=0.0)
    mld.setup_mode = "distributed"
    mld.setup(A)
    assert mld.num_levels == mlg.num_levels
    for lg, ld in zip(mlg.levels, mld.levels):
        ag, ad = lg.A.global_csr, ld.A.global_csr
        assert np.array_equal(ag.indptr, ad.indptr)
        assert np.array_equal(ag.indices, ad.indices)
        np.testing.assert_allclose(ag.data, ad.data, atol=1e-12)
