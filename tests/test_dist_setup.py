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
