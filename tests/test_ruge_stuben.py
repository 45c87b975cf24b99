"""Ruge-Stuben setup pipeline vs the PyAMG-generated golden files.

Mirrors ruge_stuben/tests/test_par_strength... test_par_splitting.cpp,
test_par_interpolation.cpp, test_par_ruge_stuben.cpp: level-by-level
S -> CF splitting -> P -> RAP against rss_* goldens with weights.txt."""

import numpy as np
import pytest

from raptor_tpu.core.matrix import compare
from raptor_tpu.core.par_matrix import par_matrix_from_scipy
from raptor_tpu.core.types import StrengthType
from raptor_tpu.gallery.io import read_pm
from raptor_tpu.ruge_stuben.cf_splitting import (
    split_cljp, split_pmis, split_rs_entry)
from raptor_tpu.ruge_stuben.interpolation import (
    direct_interpolation, mod_classical_interpolation)
from raptor_tpu.ruge_stuben.strength import strength


@pytest.fixture(scope="module")
def weights(test_data):
    return np.loadtxt(test_data / "weights.txt")


def test_strength_level0(test_data):
    a = read_pm(test_data / "rss_A0.pm")
    s = strength(a, StrengthType.Classical, 0.25)
    compare(s, read_pm(test_data / "rss_S0.pm"))


def test_strength_level1(test_data):
    a = read_pm(test_data / "rss_A1.pm")
    s = strength(a, StrengthType.Classical, 0.25)
    compare(s, read_pm(test_data / "rss_S1.pm"))


@pytest.mark.parametrize("level", [0, 1])
@pytest.mark.parametrize("variant,splitter,needs_weights", [
    ("", split_cljp, True),
    ("_pmis", split_pmis, True),
    ("_rs", None, False),
])
def test_splitting_golden(test_data, weights, level, variant, splitter,
                          needs_weights):
    s = read_pm(test_data / f"rss_S{level}.pm")
    if needs_weights:
        states = splitter(s, weights[:s.n_rows])
    else:
        # level-1 RS golden was generated without the second pass
        # (test_splitting.cpp:104-105: "PYAMG does not test second pass")
        from raptor_tpu.ruge_stuben.cf_splitting import split_rs
        states = split_rs(s, second_pass=(level == 0))
    golden = np.loadtxt(test_data / f"rss_cf{level}{variant}.txt",
                        dtype=np.int64)
    np.testing.assert_array_equal(states, golden)


# note: rss_P*_extend goldens are unused by any reference test (extended
# interpolation is validated against aniso/laplacian_P_extend below, which
# we match); rss_P1_extend does not correspond to extended+i on rss_cf1.
@pytest.mark.parametrize("level", [0, 1])
@pytest.mark.parametrize("suffix", ["", "_mc"])
def test_interpolation_golden(test_data, weights, level, suffix):
    from raptor_tpu.ruge_stuben.interpolation import extended_interpolation
    interp = {"": direct_interpolation, "_mc": mod_classical_interpolation,
              "_extend": extended_interpolation}[suffix]
    a = read_pm(test_data / f"rss_A{level}.pm")
    s = read_pm(test_data / f"rss_S{level}.pm")
    states = np.loadtxt(test_data / f"rss_cf{level}.txt", dtype=np.int64)
    p = interp(a, s, states)
    compare(p, read_pm(test_data / f"rss_P{level}{suffix}.pm"))


@pytest.mark.parametrize("prefix", ["aniso", "laplacian"])
@pytest.mark.parametrize("suffix,interp", [
    ("_P_direct", direct_interpolation),
    ("_P_mod_class", mod_classical_interpolation),
    ("_P_extend", None),
])
def test_interpolation_variants_golden(test_data, prefix, suffix, interp):
    """test_par_interpolation.cpp:100-170: aniso/laplacian A + golden S +
    golden splitting -> P for all three interpolation variants."""
    a = read_pm(test_data / f"{prefix}.pm")
    s = read_pm(test_data / f"{prefix}_S.pm")
    states = np.loadtxt(test_data / f"{prefix}_split.txt", dtype=np.int64)
    if interp is None:
        from raptor_tpu.ruge_stuben.interpolation import (
            extended_interpolation)
        p = extended_interpolation(a, s, states)
    else:
        p = interp(a, s, states)
    compare(p, read_pm(test_data / f"{prefix}{suffix}.pm"))


def test_rap_hierarchy_golden(test_data, weights):
    """Full level chain: A0 -> (S, cljp, direct P, RAP) -> A1 -> ... -> A2
    (test_par_ruge_stuben.cpp:42-120)."""
    a = par_matrix_from_scipy(read_pm(test_data / "rss_A0.pm").to_scipy(), 1)
    for next_a in ["rss_A1.pm", "rss_A2.pm"]:
        s = strength(a.global_csr, StrengthType.Classical, 0.25)
        states = split_cljp(s, weights[:a.global_num_rows])
        p = direct_interpolation(a.global_csr, s, states)
        from raptor_tpu.ruge_stuben.interpolation import par_interpolation
        from raptor_tpu.core.par_matrix import ParCSRMatrix
        pp = par_interpolation(a, ParCSRMatrix(s, a.partition), states,
                               "direct")
        ap = a.multiply(pp)
        ac = pp.transpose().multiply(ap)
        compare(ac.global_csr, read_pm(test_data / next_a))
        a = ac
