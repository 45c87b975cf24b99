"""Communication-model comparison: plain halo exchange vs the
topology-aware (TAP) schedule (examples/model_tap_steps.cpp +
profiling/profile_comm.cpp equivalents).

Prints per-schedule message counts and bytes by protocol class
(short/eager/rendezvous) and locality (intra-host ICI vs inter-host
DCN) for a stencil problem on an H x L virtual host mesh — the static
analysis the reference computes from live MPI traffic.

Run: python examples/model_tap_steps.py [grid_n] [hosts] [local]
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

from raptor_tpu.comm.plan import build_comm_plan
from raptor_tpu.comm.tap import build_tap_plan
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid
from raptor_tpu.profiling.comm_model import model_comm_plan, model_tap_plan


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (n, n),
                         H * L)
    plan = build_comm_plan(A)
    tap = build_tap_plan(A, H, L)

    plain = model_comm_plan(plan, shards_per_host=L)
    tapped = model_tap_plan(tap)
    print(f"== plain ParComm halo exchange ({H}x{L} mesh) ==")
    print(plain)
    print(f"== TAP 4-step schedule ==")
    print(tapped)
    saved = plain.inter_host_bytes - tapped.inter_host_bytes
    print(f"DCN bytes saved by TAP: {saved} "
          f"({100.0 * saved / max(1, plain.inter_host_bytes):.1f}%)")


if __name__ == "__main__":
    main()
