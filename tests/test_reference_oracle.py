"""Third correctness oracle: the reference RAPtor C++ library built
single-rank (csrc/mpi1 shim) and diffed level-by-level against our
setup — the hypre_compare analog
(/root/reference/raptor/tests/hypre_compare.hpp:11), with the reference
itself as the independent implementation.

Level-0/1 transfer operators must match BIT-exactly (same algorithms,
same glibc rand weights); deeper levels may drift by 1-ulp RAP rounding
flipping strength ties, so they are judged the way the reference judges
hypre parity: matching level counts/rates and equal preconditioner
quality (V-cycle iterations to 1e-7)."""

import numpy as np
import pytest

from raptor_tpu.external.reference_oracle import (build_oracle, run_oracle,
                                                  run_oracle_stages)

pytestmark = pytest.mark.skipif(
    build_oracle() is None,
    reason="reference tree or toolchain unavailable")


def _ours(problem, n, coarsen, interp, threshold=0.25):
    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                             laplace_stencil_27pt,
                                             par_stencil_grid)
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    if problem == "lap27":
        A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), 1)
    else:
        A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                             (n, n), 1)
    ml = ParRugeStubenSolver(threshold, CoarsenType[coarsen],
                             InterpType[interp])
    ml.setup(A)
    return A, ml


def _solve_iters(A, ml, b=None):
    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy

    dh = DeviceHierarchy(ml, dpar.make_mesh(1))
    if b is None:
        b = A.mult(np.ones(A.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
    return int(r.n_iters)


@pytest.mark.parametrize("problem,n,coarsen,interp", [
    ("aniso", 25, "CLJP", "ModClassical"),
    ("aniso", 25, "Falgout", "Direct"),
    ("lap27", 10, "PMIS", "Extended"),
])
def test_oracle_level0_bitexact_rap_roundoff(problem, n, coarsen,
                                             interp):
    """Level-0 P agrees with the real C++ implementation to the last
    bit (pattern) / 1 ulp (values), and the Galerkin product of that
    identical P agrees to summation roundoff. Determinism necessarily
    ends there: the ~1e-14 RAP rounding differences flip classical-
    strength TIES on symmetric operators (verified directly — running
    OUR strength on the reference's A1 vs ours gives different patterns
    at equal |dA1| <= 2e-14), so deeper levels are compared by quality
    (next test), exactly how the reference compares itself to hypre
    (hypre_compare.hpp, tol=1e-05)."""
    ref = run_oracle(problem, n, coarsen, interp)
    A, ml = _ours(problem, n, coarsen, interp)
    assert ref["levels"][0][0] == ml.levels[0].A.global_num_rows
    Pr = ref["P"][0]
    Po = ml.levels[0].P._g()
    ip, c, v = Po.sorted_csr()
    assert Pr.shape == (Po.n_rows, Po.n_cols)
    np.testing.assert_array_equal(Pr.indptr, ip)
    np.testing.assert_array_equal(Pr.indices, c)
    assert np.abs(Pr.data - v).max() < 1e-14
    # Ac of the bit-identical P: pure summation roundoff
    A1r = ref["A"][1]
    A1o = ml.levels[1].A.global_csr.to_scipy()
    assert A1r.nnz == A1o.nnz
    assert abs(A1r - A1o).max() < 1e-12


@pytest.mark.parametrize("problem,n,coarsen,interp", [
    ("aniso", 50, "CLJP", "ModClassical"),
    ("lap27", 12, "PMIS", "Extended"),
])
def test_oracle_preconditioner_quality(problem, n, coarsen, interp):
    """Whole-hierarchy parity the way the reference judges hypre parity:
    same level count (+-1 — deep strength ties flip on 1-ulp RAP
    rounding) and the same V-cycle iteration count (+-2) to 1e-7."""
    ref = run_oracle(problem, n, coarsen, interp)
    A, ml = _ours(problem, n, coarsen, interp)
    assert abs(len(ref["levels"]) - len(ml.levels)) <= 1
    # coarsening rates agree level by level (within ties)
    for (rr, _), lo in zip(ref["levels"][:3], ml.levels[:3]):
        ro = lo.A.global_num_rows
        assert abs(rr - ro) <= max(2, 0.05 * ro), (rr, ro)
    iters = _solve_iters(A, ml)
    assert abs(ref["iters"] - iters) <= 2, (ref["iters"], iters)


def test_oracle_matrix_file(test_data):
    """Arbitrary-operator entry (the external-solver wrapper analog,
    hypre_wrapper.cpp:205-244): the oracle reads any .pm file with the
    reference's own readParMatrix and runs the real solver on it —
    level-0 P must stay bit-exact against ours on the same file."""
    from raptor_tpu.core.par_matrix import par_matrix_from_scipy
    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.gallery.io import read_pm
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    path = str(test_data / "aniso.pm")
    ref = run_oracle(path, 0, "CLJP", "ModClassical")
    A = par_matrix_from_scipy(read_pm(path).to_scipy(), 1)
    ml = ParRugeStubenSolver(0.25, CoarsenType.CLJP,
                             InterpType.ModClassical)
    ml.setup(A)
    Pr = ref["P"][0]
    ip, c, v = ml.levels[0].P._g().sorted_csr()
    np.testing.assert_array_equal(Pr.indptr, ip)
    np.testing.assert_array_equal(Pr.indices, c)
    assert np.abs(Pr.data - v).max() < 1e-14
    iters = _solve_iters(A, ml)
    assert abs(ref["iters"] - iters) <= 2


def test_oracle_smoothed_aggregation():
    """SA production parity: the reference's solver aggregates WITHOUT
    rand tie-breaks (par_smoothed_aggregation_solver.hpp:80 — only its
    unit tests pass weights.txt); after matching that, the whole lap27
    SA hierarchy agrees to 1 ulp."""
    ref = run_oracle("lap27", 12, "SA", "-", threshold=0.0)
    from raptor_tpu.aggregation.solver import ParSmoothedAggregationSolver
    from raptor_tpu.gallery.stencils import (laplace_stencil_27pt,
                                             par_stencil_grid)
    A = par_stencil_grid(laplace_stencil_27pt(), (12, 12, 12), 1)
    ml = ParSmoothedAggregationSolver(strong_threshold=0.0)
    ml.setup(A)
    assert ref["levels"] == [(lvl.A.global_num_rows, lvl.A.nnz)
                             for lvl in ml.levels]
    Pr = ref["P"][0]
    ip, c, v = ml.levels[0].P._g().sorted_csr()
    np.testing.assert_array_equal(Pr.indptr, ip)
    np.testing.assert_array_equal(Pr.indices, c)
    assert np.abs(Pr.data - v).max() < 1e-14


def test_oracle_hmis_extended_h_stability():
    """Round-3 stall closure, REVERSED by this oracle: the round-3
    diagnosis called the HMIS+Extended degradation "h-dependent
    coarsening, not a bug", but the independent C++ implementation
    holds ~21 V-cycles from 256^2 through 1024^2 on the rotated
    anisotropic operator. The real cause was a semantics divergence in
    our extended+i port (serial interpolation.cpp semantics instead of
    the production par_interpolation.cpp:301 path: weak-in-pattern
    entries must fold INTO P). This test pins the fix: our iteration
    counts must track the reference's (+-2) as h shrinks."""
    for n in (64, 128, 256):
        ref = run_oracle("aniso", n, "HMIS", "Extended")["iters"]
        from raptor_tpu.core.types import RelaxType   # noqa: F401
        A, ml = _ours("aniso", n, "HMIS", "Extended")
        ours = _solve_iters(A, ml)
        assert abs(ours - ref) <= 2, (n, ours, ref)

def _our_stage0(A, coarsen, interp, threshold=0.25):
    """Run OUR level-0 stages exactly as ParRugeStubenSolver does
    (par_multilevel.py extend_hierarchy), returning (S, states, P)."""
    from raptor_tpu.core.types import CoarsenType, StrengthType
    from raptor_tpu.ruge_stuben import cf_splitting as cf
    from raptor_tpu.ruge_stuben.interpolation import par_interpolation
    from raptor_tpu.ruge_stuben.strength import strength
    from raptor_tpu.utils.glibc_rand import form_rand_weights

    s = strength(A, StrengthType.Classical, threshold, 1, None)
    w = form_rand_weights(A.global_num_rows, 0)
    ct = CoarsenType[coarsen]
    split = {CoarsenType.RS: lambda: cf.split_rs_entry(s),
             CoarsenType.CLJP: lambda: cf.split_cljp(s, w),
             CoarsenType.Falgout: lambda: cf.split_falgout(s, w),
             CoarsenType.PMIS: lambda: cf.split_pmis(s, w),
             CoarsenType.HMIS: lambda: cf.split_hmis(s, w)}[ct]
    states = split()
    kind = {"Direct": "direct", "ModClassical": "mod_classical",
            "Extended": "extended"}[interp]
    p = par_interpolation(A, s, states, kind)
    return s, np.asarray(states), p


@pytest.mark.parametrize("problem,n,coarsen,interp", [
    ("aniso", 25, "HMIS", "Extended"),
    ("aniso", 25, "CLJP", "ModClassical"),
    ("lap27", 10, "PMIS", "Extended"),
])
def test_oracle_stage_dumps(problem, n, coarsen, interp):
    """Per-STAGE diffing against the live reference (its own
    test_hypre_splitting / test_hypre_strength discipline): the level-0
    strength matrix must match bit-exactly (pattern AND values) and the
    CF splitting states must be identical integers — so the NEXT
    semantics divergence localizes to strength vs splitting vs interp
    in one test run instead of a round of hierarchy bisection
    (the round-4 extended+i bug took exactly that bisection)."""
    ref = run_oracle_stages(problem, n, coarsen, interp)
    assert ref is not None and len(ref["S"]) >= 1 and len(ref["cf"]) >= 1

    from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                             laplace_stencil_27pt,
                                             par_stencil_grid)
    if problem == "lap27":
        A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), 1)
    else:
        A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                             (n, n), 1)
    s, states, p = _our_stage0(A, coarsen, interp)

    Sr = ref["S"][0]
    ip, c, v = s._g().sorted_csr()
    np.testing.assert_array_equal(Sr.indptr, ip)
    np.testing.assert_array_equal(Sr.indices, c)
    assert np.abs(Sr.data - v).max() < 1e-14

    np.testing.assert_array_equal(ref["cf"][0], states)


def test_oracle_stage_dumps_pm_operator(test_data):
    """Stage dumps on an arbitrary .pm operator (read by the
    reference's own readParMatrix on its side, by gallery.io.read_pm on
    ours): level-0 S pattern+values and CF states must be identical."""
    from raptor_tpu.core.par_matrix import par_matrix_from_scipy
    from raptor_tpu.gallery.io import read_pm

    path = str(test_data / "aniso.pm")
    ref = run_oracle_stages(path, 0, "PMIS", "Extended")
    assert ref is not None and len(ref["S"]) >= 1
    A = par_matrix_from_scipy(read_pm(path).to_scipy(), 1)
    s, states, p = _our_stage0(A, "PMIS", "Extended")

    Sr = ref["S"][0]
    ip, c, v = s._g().sorted_csr()
    np.testing.assert_array_equal(Sr.indptr, ip)
    np.testing.assert_array_equal(Sr.indices, c)
    assert np.abs(Sr.data - v).max() < 1e-14
    np.testing.assert_array_equal(ref["cf"][0], states)


def test_solve_with_reference_external_solver():
    """solve_with_reference: the live external-solver wrapper (the
    hypre_wrapper.cpp:205-244 creator analog, with the reference
    library itself as the external AMG). Solves OUR operator + rhs and
    must agree with our own solver on both the solution and the
    V-cycle count class."""
    from raptor_tpu.external.reference_oracle import solve_with_reference

    A, ml = _ours("aniso", 40, "RS", "ModClassical")
    rng = np.random.default_rng(5)
    xstar = rng.random(A.global_num_cols)
    b = A.mult(xstar)
    ref = solve_with_reference(A, b, coarsen="RS", interp="ModClassical")
    assert ref is not None
    # the reference converged on our operator...
    rres = np.linalg.norm(b - A.mult(ref["x"])) / np.linalg.norm(b)
    assert rres < 1e-5, rres
    assert ref["residuals"][-1] < ref["residuals"][0] * 1e-7
    # ...and matches our preconditioner quality on the same rhs
    ours = _solve_iters(A, ml, b=b)
    assert abs(ref["iters"] - ours) <= 3, (ref["iters"], ours)
