"""Real-matrix AMG-PCG driver (examples/benchmark_nek5000.cpp
equivalent): load an operator from disk (MatrixMarket/.pm — the
reference reads a nek5000 pressure matrix; LFAT5.mtx ships with its
examples), build the AMG hierarchy, and solve with AMG-preconditioned
CG on the device mesh.

Run: python examples/benchmark_nek5000.py [file.mtx|file.pm] [n_shards]
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.io import read_mm, read_pm
from raptor_tpu.krylov.cg import cg
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/examples/LFAT5.mtx"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else \
        min(4, len(jax.devices()))

    t0 = time.perf_counter()
    a = read_pm(path) if path.endswith(".pm") else read_mm(path)
    print(f"read {path}: {a.n_rows} x {a.n_cols}, nnz {a.nnz} "
          f"({time.perf_counter() - t0:.3f} s)")

    part = Partition.create(a.n_rows, a.n_cols, n_shards)
    A = ParCSRMatrix(a, part)

    # quality repartition (the reference's ParMETIS step,
    # benchmark_nek5000.cpp's pre-partitioned inputs): native multilevel
    # k-way vs naive contiguous rows vs RCM banding, by induced halo
    from raptor_tpu.linalg.repartition import (comm_volume,
                                               partition_graph,
                                               repartition_matrix)
    naive = comm_volume(A, np.repeat(np.arange(n_shards),
                                     -(-A.global_num_rows // n_shards))
                        [:A.global_num_rows])
    t0 = time.perf_counter()
    proc = partition_graph(A, n_shards, method="kway")
    t_kway = time.perf_counter() - t0
    vk = comm_volume(A, proc)
    vr = comm_volume(A, partition_graph(A, n_shards, method="rcm"))
    print(f"partition halo_values: naive {naive['halo_values']}, "
          f"rcm {vr['halo_values']}, kway {vk['halo_values']} "
          f"(edge cut {naive['edge_cut']}/{vr['edge_cut']}/"
          f"{vk['edge_cut']}; kway {t_kway:.3f} s)")
    A, _ = repartition_matrix(A, proc)

    rng = np.random.default_rng(0)
    b = A.mult(rng.random(A.global_num_rows))

    ml = ParRugeStubenSolver(0.25)
    t0 = time.perf_counter()
    ml.setup(A)
    print(f"setup {time.perf_counter() - t0:.3f} s")
    print(ml.print_hierarchy())

    mesh = dpar.make_mesh(n_shards)
    dh = DeviceHierarchy(ml, mesh)
    r = cg(mesh, dh.levels[0].A, dh.vector(np.zeros_like(b)),
           dh.vector(b), tol=1e-8, max_iter=200,
           precond=dh.precond_pack())
    hist = np.asarray(r.res)
    hist = hist[hist >= 0]
    print(f"AMG-PCG: {int(r.n_iters)} iters, "
          f"final rel res {hist[-1]:.3e}")


if __name__ == "__main__":
    main()
