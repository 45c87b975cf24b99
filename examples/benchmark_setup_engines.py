"""Setup-engine shoot-out: host native kernels vs the device (TPU)
engines for the two dominant setup phases — interpolation
(device/interp.py) and the Galerkin RAP (device/spgemm.py).

This is the driver for re-timing the on-chip setup path: it builds the
level-0 operands once, then times each engine on the SAME inputs.
On a CPU-pinned run the device engine runs on the one host core (slow,
correctness only); on a real TPU it is the production path that
`interp_mode=auto` / `rap_mode=auto` select.

Run: python examples/benchmark_setup_engines.py [grid_n] [dim]
     [coarsen] [interp]
e.g. 128 3 PMIS Extended  (the 128^3 bench config)
     2048 2 RS ModClassical (the 2048^2 bench config)
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import numpy as np

import jax

import os as _os
if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from raptor_tpu import native
from raptor_tpu.core.types import CoarsenType, InterpType, StrengthType
from raptor_tpu.device import spgemm as dsp
from raptor_tpu.device.interp import (extended_interp_device,
                                      mod_classical_interp_device)
from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,
                                         laplace_stencil_27pt,
                                         par_stencil_grid)
from raptor_tpu.ruge_stuben import cf_splitting as cf
from raptor_tpu.ruge_stuben.interpolation import (_coarse_map,
                                                  extended_interpolation,
                                                  mod_classical_interpolation)
from raptor_tpu.ruge_stuben.strength import strength
from raptor_tpu.utils.glibc_rand import form_rand_weights
from raptor_tpu.utils.hostmem import pin_arena


def timed(label, fn, reps=1):
    best = np.inf
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:28s} {best:8.3f}s")
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    coarsen = (CoarsenType[sys.argv[3]] if len(sys.argv) > 3
               else CoarsenType.PMIS)
    interp = (InterpType[sys.argv[4]] if len(sys.argv) > 4
              else InterpType.Extended)
    pin_arena(prefault_bytes=6 << 30)

    if dim == 3:
        A = par_stencil_grid(laplace_stencil_27pt(), (n, n, n), 1)
    else:
        A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8),
                             (n, n), 1)
    a = A.global_csr
    print(f"A: {a.n_rows} rows, {a.nnz} nnz "
          f"({jax.devices()[0].platform} device)")

    w = form_rand_weights(A.global_num_rows, 0)
    s = strength(A, StrengthType.Classical, 0.25, 1, None)
    split = {CoarsenType.PMIS: cf.split_pmis, CoarsenType.HMIS:
             cf.split_hmis, CoarsenType.CLJP: cf.split_cljp,
             CoarsenType.RS: lambda s, w: cf.split_rs_entry(s)}[coarsen]
    states = np.asarray(split(s, w))
    col_to_new, n_coarse = _coarse_map(states)
    a_indptr, a_indices, _ = a.sorted_csr()
    s_indptr, s_indices, _ = s.global_csr.sorted_csr()
    strong = native.mark_strong(a_indptr, a_indices, s_indptr,
                                s_indices, a.n_rows)

    print("interpolation:")
    if interp == InterpType.Extended:
        p = timed("host native extended+i", lambda: extended_interpolation(
            a, s.global_csr, states))
        pd = timed("device extended+i", lambda: extended_interp_device(
            a, strong, states, col_to_new, n_coarse))
        pd2 = timed("device extended+i (warm)", lambda:
                    extended_interp_device(a, strong, states, col_to_new,
                                           n_coarse))
    else:
        p = timed("host native mod-classical", lambda:
                  mod_classical_interpolation(a, s.global_csr, states))
        pd = timed("device mod-classical", lambda:
                   mod_classical_interp_device(a, strong, states,
                                               col_to_new, n_coarse))
        pd2 = timed("device mod-classical (warm)", lambda:
                    mod_classical_interp_device(a, strong, states,
                                                col_to_new, n_coarse))
    same = (np.array_equal(p.indptr, pd.indptr)
            and np.array_equal(p.indices, pd.indices))
    dv = np.abs(p.data - pd.data).max() if same else np.inf
    print(f"  pattern_eq={same} max|dv|={dv:.2e} nnz={p.nnz}")

    print("Galerkin RAP (level 0):")
    from raptor_tpu.core.par_matrix import ParCSRMatrix
    from raptor_tpu.core.partition import Partition
    P = ParCSRMatrix(p, Partition.create(p.n_rows, p.n_cols, 1))
    ap = timed("host native A*P", lambda: A.multiply(P))
    timed("host native Pt(AP)", lambda: P.mult_T_mat(ap))
    dt = None if jax.devices()[0].platform != "tpu" else np.float32
    timed("device rap (AP + PtAP)", lambda: dsp.rap_device(
        a, p, dtype=dt, need_ap=False))
    timed("device rap (warm)", lambda: dsp.rap_device(
        a, p, dtype=dt, need_ap=False))


if __name__ == "__main__":
    main()
