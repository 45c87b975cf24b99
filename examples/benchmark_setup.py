"""AMG setup phase benchmark, per-component (benchmark_setup.cpp,
benchmark_rss.cpp equivalents): drives the RS pipeline level by level
and times strength, CF splitting, interpolation, and the RAP Galerkin
product separately.

Run: python examples/benchmark_setup.py [grid_n] [coarsen] [interp]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np

from raptor_tpu.core.types import CoarsenType, InterpType, StrengthType
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.profiling.timers import Profiler
from raptor_tpu.ruge_stuben import cf_splitting as cf
from raptor_tpu.ruge_stuben.interpolation import par_interpolation
from raptor_tpu.ruge_stuben.strength import strength
from raptor_tpu.utils.glibc_rand import form_rand_weights


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    coarsen = (CoarsenType[sys.argv[2]] if len(sys.argv) > 2
               else CoarsenType.CLJP)
    interp = ({"Direct": "direct", "ModClassical": "mod_classical",
               "Extended": "extended"}[sys.argv[3]]
              if len(sys.argv) > 3 else "mod_classical")

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n), 1)
    weights = form_rand_weights(A.global_num_rows, 0)

    prof = Profiler()
    a = A
    t0 = time.perf_counter()
    level = 0
    print(f"{'lvl':>3} {'rows':>9} {'nnz':>10}")
    while a.global_num_rows > 50 and level < 25:
        with prof.phase("strength"):
            s = strength(a, StrengthType.Classical, 0.25)
        w = weights[:a.global_num_rows]
        with prof.phase("cf_splitting"):
            if coarsen == CoarsenType.CLJP:
                states = cf.split_cljp(s, w)
            elif coarsen == CoarsenType.PMIS:
                states = cf.split_pmis(s, w)
            elif coarsen == CoarsenType.HMIS:
                states = cf.split_hmis(s, w)
            else:
                states = cf.split_falgout(s, w)
        with prof.phase("interpolation"):
            p = par_interpolation(a, s, states, interp)
        with prof.phase("RAP"):
            ap = a.multiply(p)
            ac = ap.transpose_multiply(p) if hasattr(ap, "transpose_multiply") \
                else p.transpose().multiply(ap)
        print(f"{level:>3} {a.global_num_rows:>9} {a.nnz:>10}")
        a = ac
        level += 1
    total = time.perf_counter() - t0

    print(prof.report())
    print(f"total setup: {total:.3f}s "
          f"({A.nnz / total / 1e6:.2f} Mnnz/s over the fine-level nnz)")


if __name__ == "__main__":
    main()
