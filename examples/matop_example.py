"""Matrix-operation demo: add / subtract / scale / transpose on serial
and parallel containers (examples/matop_example.cpp equivalent).

Builds two stencil operators, exercises ``A + B``, ``A - B``, diagonal
extraction and the distributed transpose, and verifies each against the
dense/scipy oracle.

Run: python examples/matop_example.py [grid_n] [n_shards]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                         par_stencil_grid, stencil_grid)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    s1 = diffusion_stencil_2d(1.0, 0.0)
    s2 = diffusion_stencil_2d(0.001, np.pi / 8)

    # serial CSR ops
    A = stencil_grid(s1, (n, n))
    B = stencil_grid(s2, (n, n))
    C = A.add(B)
    D = A.subtract(B)
    a, b = A.to_scipy(), B.to_scipy()
    assert abs(C.to_scipy() - (a + b)).max() < 1e-14
    assert abs(D.to_scipy() - (a - b)).max() < 1e-14
    print(f"serial add/subtract ok  (n={A.n_rows}, nnz={A.indptr[-1]})")

    # parallel ops over the sharded containers
    Ap = par_stencil_grid(s1, (n, n), n_shards)
    Bp = par_stencil_grid(s2, (n, n), n_shards)
    Cp = Ap.add(Bp)
    Dp = Ap.subtract(Bp)
    x = np.random.default_rng(7).random(Ap.global_num_cols)
    assert np.abs(Cp.mult(x) - (a + b) @ x).max() < 1e-12
    assert np.abs(Dp.mult(x) - (a - b) @ x).max() < 1e-12
    print(f"parallel add/subtract ok ({n_shards} shards)")

    # diagonal + transpose
    d = Ap.diagonal()
    assert np.abs(d - a.diagonal()).max() < 1e-14
    At = Ap.transpose()
    assert np.abs(At.mult(x) - a.T @ x).max() < 1e-12
    print("diagonal + distributed transpose ok")

    # Galerkin-style triple product sanity: R A P with P = A, R = A^T
    AP = Ap.multiply(Bp)
    assert abs(AP.mult(x) - a @ (b @ x)).max() < 1e-10
    print("parallel multiply ok")
    print("ok")


if __name__ == "__main__":
    main()
