"""Container round-trip demo: fill a random ParCOO, convert to ParCSR,
run an SpMV (examples/coo_example.cpp + csr_example.cpp equivalents).

The reference builds a random n x m ParCOOMatrix with add_value, unit
diagonal, converts to ParCSRMatrix and checks ``|Ax|`` agreement between
the two formats (coo_example.cpp:17-80). Here the same flow runs over
the sharded containers and additionally checks the device SpMV on an
8-way virtual mesh against the host product.

Run: python examples/coo_csr_example.py [n] [m] [n_shards]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from raptor_tpu.core.par_matrix import ParCOOMatrix
    from raptor_tpu.core.partition import Partition
    from raptor_tpu.device import par as dpar

    rng = np.random.default_rng(42)
    part = Partition.create(n, m, n_shards)

    # unit diagonal + random off-diagonal entries, added in COO order
    coo = ParCOOMatrix(part)
    for i in range(n):
        coo.add_global_value(i, i % m, 1.0)
    nnz_extra = int(rng.integers(n, 4 * n))
    rows = rng.integers(0, n, nnz_extra)
    cols = rng.integers(0, m, nnz_extra)
    vals = rng.random(nnz_extra)
    coo.add_values(rows, cols, vals)

    a = coo.finalize()
    print(f"ParCOO -> ParCSR: global {a.global_num_rows}x{a.global_num_cols}, "
          f"nnz={a.nnz}, shards={a.n_shards}")

    x = rng.random(a.global_num_cols)
    y_host = a.mult(x)
    print(f"host SpMV  |Ax|_2 = {np.linalg.norm(y_host):.12e}")

    if a.global_num_cols == a.global_num_rows:
        mesh = dpar.make_mesh(min(n_shards, len(jax.devices())))
        A = dpar.device_put_matrix(a, mesh)
        xd = dpar.device_put_vector(x, a.partition.col_bounds, A.cols_pad,
                                    mesh)
        yd = dpar.host_vector(dpar.spmv(mesh, A, xd),
                              a.partition.row_bounds)
        print(f"device SpMV |Ax|_2 = {np.linalg.norm(yd):.12e} "
              f"(max |host-dev| = {np.abs(yd - y_host).max():.3e})")
        assert np.abs(yd - y_host).max() < 1e-10

    print("ok")


if __name__ == "__main__":
    main()
