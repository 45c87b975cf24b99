"""Matrix I/O benchmark (examples/benchmark_reader.cpp equivalent):
reads a PETSc binary ``.pm`` or MatrixMarket ``.mtx`` file, reports read
time, shape/nnz, and a SpMV timing on the loaded operator.

Run: python examples/benchmark_reader.py <file.pm|file.mtx> [n_shards]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np

import jax

# honor JAX_PLATFORMS=cpu for mesh dry-runs (the TPU plugin's
# sitecustomize force-sets the platform list)
import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.partition import Partition
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.io import read_mm, read_pm


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/test_data/aniso.pm"
    n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    t0 = time.perf_counter()
    a = read_pm(path) if path.endswith(".pm") else read_mm(path)
    t_read = time.perf_counter() - t0
    print(f"read {path}: {a.n_rows} x {a.n_cols}, nnz {a.nnz} "
          f"in {t_read * 1e3:.1f} ms")

    part = Partition.create(a.n_rows, a.n_cols, n_shards)
    A = ParCSRMatrix(a, part)
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(
        A, mesh, dtype=jnp.float32,
        lane_pad=128 if jax.devices()[0].platform == "tpu" else 1)
    x = dpar.device_put_vector(
        np.random.default_rng(0).random(a.n_cols),
        part.col_bounds, dA.cols_pad, mesh, dtype=jnp.float32)
    b = dpar.spmv(mesh, dA, x)
    b.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        b = dpar.spmv(mesh, dA, x)
    b.block_until_ready()
    dt = (time.perf_counter() - t0) / 10
    print(f"format {dA.on_format}; SpMV {dt * 1e6:.1f} us "
          f"({a.nnz / dt / 1e9:.2f} Gnnz/s incl dispatch)")


if __name__ == "__main__":
    main()
