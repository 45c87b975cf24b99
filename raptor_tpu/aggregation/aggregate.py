"""Aggregation of nodes around MIS roots
(aggregation/aggregate.cpp:6-95; parallel par_aggregate.cpp:7-187)."""

from __future__ import annotations

import numpy as np

from raptor_tpu.core.matrix import CSRMatrix


def aggregate(a: CSRMatrix, s: CSRMatrix, states: np.ndarray,
              rand_vals: np.ndarray = None):
    """Returns (n_aggs, aggregates[i] in [0, n_aggs))."""
    n = s.n_rows
    r = (np.asarray(rand_vals, dtype=np.float64)[:n] if rand_vals is not None
         else np.zeros(n))
    sm = s.to_scipy()
    am = a.to_scipy()
    sm.sort_indices(), am.sort_indices()

    aggregates = np.full(n, -1, dtype=np.int64)

    from raptor_tpu import native
    if native.available():
        n_aggs = native.aggregate(
            sm.indptr, sm.indices, am.indptr, am.indices,
            np.ascontiguousarray(am.data, dtype=np.float64),
            np.ascontiguousarray(states, dtype=np.int64),
            np.ascontiguousarray(r), aggregates)
        return int(n_aggs), aggregates

    roots = np.nonzero(states > 0)[0]
    n_aggs = len(roots)
    aggregates[roots] = np.arange(n_aggs)

    # pass 1: join any neighboring root's aggregate (first in col order)
    for i in range(n):
        if states[i] > 0:
            continue
        for col in sm.indices[sm.indptr[i]:sm.indptr[i + 1]]:
            if states[col] > 0:
                aggregates[i] = aggregates[col]
                break

    # pass 2: remaining nodes join the strongest neighbor's aggregate,
    # ranked by |a_ij| + r[col]; assignments encoded negative so pass-2
    # results don't cascade (aggregate.cpp:60-88)
    for i in range(n):
        if aggregates[i] >= 0:
            continue
        max_val, max_agg = 0.0, -1
        ctr = am.indptr[i]
        for col in sm.indices[sm.indptr[i]:sm.indptr[i + 1]]:
            while am.indices[ctr] != col:
                ctr += 1
            val = abs(am.data[ctr]) + r[col]
            if val > max_val and aggregates[col] >= 0:
                max_val, max_agg = val, aggregates[col]
        aggregates[i] = -(max_agg + 1)
    neg = aggregates < 0
    aggregates[neg] = -(aggregates[neg] + 1)
    return n_aggs, aggregates
