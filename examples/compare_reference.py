"""Cross-validate a hierarchy against the LIVE reference implementation
(the hypre-diff analog the reference itself uses: tests/hypre_compare.hpp).

Builds the same operator + config in raptor_tpu and in the real RAPtor
C++ library (compiled single-rank through csrc/mpi1), then reports:
level sizes side by side, level-0 P max |dP| (expected: 0 / 1 ulp),
level-1 A max |dA| (expected: summation roundoff), and V-cycle
iteration counts.

Run: python examples/compare_reference.py [aniso|lap27|file.pm] [n]
     [coarsen] [interp] [threshold]
e.g. python examples/compare_reference.py aniso 100 HMIS Extended 0.25
     python examples/compare_reference.py lap27 12 SA -
     python examples/compare_reference.py /root/reference/test_data/aniso.pm 0 CLJP ModClassical
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from raptor_tpu.external.reference_oracle import build_oracle, run_oracle


def main():
    prob = sys.argv[1] if len(sys.argv) > 1 else "aniso"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    coarsen = sys.argv[3] if len(sys.argv) > 3 else "CLJP"
    interp = sys.argv[4] if len(sys.argv) > 4 else "ModClassical"
    threshold = float(sys.argv[5]) if len(sys.argv) > 5 else 0.25

    if build_oracle() is None:
        print("reference tree/toolchain unavailable — nothing to compare")
        return
    ref = run_oracle(prob, n, coarsen, interp, threshold)

    from raptor_tpu.core.par_matrix import par_matrix_from_scipy
    from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
    from raptor_tpu.gallery.io import read_pm
    from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                             laplace_stencil_27pt,
                                             par_stencil_grid)
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    if prob.endswith(".pm"):
        A = par_matrix_from_scipy(read_pm(prob).to_scipy(), 1)
    elif prob == "lap27":
        A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), 1)
    else:
        A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                             (n, n), 1)
    if coarsen == "SA":
        from raptor_tpu.aggregation.solver import (
            ParSmoothedAggregationSolver)
        ml = ParSmoothedAggregationSolver(strong_threshold=threshold)
    else:
        ml = ParRugeStubenSolver(threshold, CoarsenType[coarsen],
                                 InterpType[interp])
    ml.setup(A)

    print(f"{'lvl':>3} {'ref rows':>9} {'ref nnz':>9} "
          f"{'our rows':>9} {'our nnz':>9}")
    for i, (rr, rn) in enumerate(ref["levels"]):
        if i < len(ml.levels):
            lvl = ml.levels[i]
            print(f"{i:3d} {rr:9d} {rn:9d} "
                  f"{lvl.A.global_num_rows:9d} {lvl.A.nnz:9d}")
        else:
            print(f"{i:3d} {rr:9d} {rn:9d} {'-':>9} {'-':>9}")

    if ref["P"] and ml.levels[0].P is not None:
        Pr = ref["P"][0]
        ip, c, v = ml.levels[0].P._g().sorted_csr()
        if Pr.nnz == len(v) and np.array_equal(Pr.indices, c):
            print(f"level-0 P: pattern EXACT, "
                  f"max|dP| = {np.abs(Pr.data - v).max():.2e}")
        else:
            print(f"level-0 P: pattern differs "
                  f"(ref {Pr.nnz} nnz vs ours {len(v)})")
    if len(ref["A"]) > 1 and len(ml.levels) > 1:
        dA = abs(ref["A"][1] - ml.levels[1].A.global_csr.to_scipy())
        print(f"level-1 A: max|dA| = "
              f"{dA.max() if dA.nnz else 0.0:.2e}")

    from raptor_tpu.device import par as dpar
    from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
    dh = DeviceHierarchy(ml, dpar.make_mesh(1))
    b = A.mult(np.ones(A.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
    print(f"V-cycles to 1e-7: reference {ref['iters']}, "
          f"ours {int(r.n_iters)}")


if __name__ == "__main__":
    main()
