"""Native C++ setup kernels must be bit-identical to the Python oracles."""

import os

import numpy as np
import pytest

from raptor_tpu import native
from raptor_tpu.core.types import StrengthType
from raptor_tpu.gallery.io import read_pm
from raptor_tpu.ruge_stuben.strength import strength

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native kernels unavailable")


def _python_only(fn, *args, **kw):
    os.environ["RAPTOR_TPU_NATIVE"] = "0"
    native._lib = None
    try:
        return fn(*args, **kw)
    finally:
        os.environ["RAPTOR_TPU_NATIVE"] = "1"
        native._lib = None


@pytest.mark.parametrize("splitter_name", ["rs", "cljp", "pmis"])
def test_native_matches_python_splitting(test_data, splitter_name):
    from raptor_tpu.ruge_stuben import cf_splitting as cf

    s = read_pm(test_data / "rss_S0.pm")
    w = np.loadtxt(test_data / "weights.txt")[:s.n_rows]
    if splitter_name == "rs":
        run = lambda: cf.split_rs(read_pm(test_data / "rss_S0.pm"))
    elif splitter_name == "cljp":
        run = lambda: cf.split_cljp(read_pm(test_data / "rss_S0.pm"), w)
    else:
        run = lambda: cf.split_pmis(read_pm(test_data / "rss_S0.pm"), w)
    native_states = run()
    python_states = _python_only(run)
    np.testing.assert_array_equal(native_states, python_states)


def test_native_matches_python_mis_aggregate(test_data):
    from raptor_tpu.aggregation.aggregate import aggregate
    from raptor_tpu.aggregation.mis import mis2

    a = read_pm(test_data / "sas_A0.pm")
    s = strength(a, StrengthType.Symmetric, 0.25)
    w = np.loadtxt(test_data / "weights.txt")[:a.n_rows]

    st_n = mis2(s, w)
    st_p = _python_only(mis2, s, w)
    np.testing.assert_array_equal(st_n, st_p)

    na, agg_n = aggregate(a, s, st_n, w)
    pa, agg_p = _python_only(aggregate, a, s, st_n, w)
    assert na == pa
    np.testing.assert_array_equal(agg_n, agg_p)
