"""raptor_tpu: a TPU-native algebraic multigrid (AMG) framework.

A from-scratch reimplementation of the capabilities of RAPtor
(raptor-library/raptor, C++/MPI) designed for TPUs:

- **Setup phase** (strength of connection, coarsening, interpolation, Galerkin
  RAP products) runs on the host over NumPy/C++ and produces *static, padded,
  device-ready index plans* per hierarchy level.
- **Solve phase** (SpMV, smoothers, V-cycle, Krylov) is fully jitted JAX,
  sharded over a 1-D ``jax.sharding.Mesh`` axis of matrix rows. Halo exchange
  (the equivalent of RAPtor's ``ParComm``/``TAPComm``) is a static
  gather -> ``all_to_all`` -> scatter schedule compiled by XLA onto ICI.

Reference layer map: /root/reference/raptor/raptor.hpp:1-122 (see SURVEY.md).
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (off with RAPTOR_TPU_CACHE=0).

    The jitted V-cycle program is large and TPU compilation can run
    through a remote compile service; caching makes repeat runs start in
    seconds instead of minutes."""
    if _os.environ.get("RAPTOR_TPU_CACHE", "1") == "0":
        return
    try:
        import jax
        path = _os.environ.get(
            "RAPTOR_TPU_CACHE_DIR",
            _os.path.expanduser("~/.cache/raptor_tpu_xla"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_enable_compile_cache()

from raptor_tpu.core.types import (
    CoarsenType,
    InterpType,
    AggType,
    RelaxType,
    StrengthType,
    ZERO_TOL,
)
from raptor_tpu.core.partition import Partition
from raptor_tpu.core.matrix import (CSRMatrix, COOMatrix,
                                    CSCMatrix, BSRMatrix, BCOOMatrix,
                                    BSCMatrix)
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.vector import ParVector

__version__ = "0.1.0"
