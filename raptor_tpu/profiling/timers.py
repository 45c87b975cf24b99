"""Phase timers + device trace hooks.

Equivalent of the reference's profiling shim (core/mpi_types.cpp:13-60
init_profile/finalize_profile/print_profile and ParMultilevel's per-level
setup/solve timers, par_multilevel.hpp:127-205). Host phases are wall-clock;
device work is profiled via jax.profiler traces."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class Profiler:
    """Accumulating named wall-clock timers."""

    def __init__(self):
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def reset(self):
        self.times.clear()
        self.counts.clear()

    def report(self) -> str:
        lines = ["phase timers:"]
        for k in sorted(self.times):
            lines.append(f"  {k:30s} {self.times[k]:10.4f}s  "
                         f"x{self.counts[k]}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace around a block (XProf-compatible)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
