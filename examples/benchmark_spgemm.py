"""SpGEMM / Galerkin triple-product benchmark
(examples/benchmark_matmult.cpp, benchmark_spgemm_overlap.cpp
equivalents): times A*P and P^T(AP) per level of an RS hierarchy and
reports output nnz/s.

Run: python examples/benchmark_spgemm.py [grid_n] [coarsen] [interp]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from raptor_tpu.core.types import CoarsenType, InterpType
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    coarsen = (CoarsenType[sys.argv[2]] if len(sys.argv) > 2
               else CoarsenType.RS)
    interp = (InterpType[sys.argv[3]] if len(sys.argv) > 3
              else InterpType.ModClassical)

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n), 1)
    ml = ParRugeStubenSolver(0.25, coarsen, interp)
    t0 = time.perf_counter()
    ml.setup(A)
    total = time.perf_counter() - t0

    print(f"{'lvl':>3} {'nnz(AP)+nnz(Ac)':>16} {'seconds':>9} "
          f"{'nnz/s':>12}")
    for lvl, nnz_out, secs in ml.rap_stats:
        print(f"{lvl:3d} {nnz_out:16d} {secs:9.3f} "
              f"{nnz_out / max(secs, 1e-9):12.3e}")
    rap_t = sum(s[2] for s in ml.rap_stats)
    rap_nnz = sum(s[1] for s in ml.rap_stats)
    print(f"total RAP {rap_t:.2f}s of {total:.2f}s setup; "
          f"{rap_nnz / max(rap_t, 1e-9):.3e} nnz/s")


if __name__ == "__main__":
    main()
