"""Small LRU for compiled Krylov solvers.

A fresh ``@jax.jit`` closure per call would retrace (and, through a
remote compile service, recompile) every solve, so the solvers cache the
compiled ``run`` per (solver, mesh, knobs, preconditioner). Entries pin
the preconditioner pack — the whole device hierarchy — so the cache is
bounded: beyond ``MAX_ENTRIES`` the least-recently-used compiled solver
and its device buffers are released.
"""

from __future__ import annotations

from collections import OrderedDict

MAX_ENTRIES = 16


class RunCache:
    def __init__(self, max_entries: int = MAX_ENTRIES):
        self._d: OrderedDict = OrderedDict()
        self.max_entries = max_entries

    def get(self, key):
        hit = self._d.get(key)
        if hit is not None:
            self._d.move_to_end(key)
        return hit

    def put(self, key, value) -> None:
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.max_entries:
            self._d.popitem(last=False)


def precond_key(precond):
    """Stable cache token for a preconditioner pack: the strip/apply
    closures returned by ``DeviceHierarchy.precond_pack()`` are cached on
    the hierarchy, so their ids identify the hierarchy for its lifetime."""
    if precond is None:
        return None
    return (id(precond[2]), id(precond[3]))
