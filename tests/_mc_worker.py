"""Multi-controller bridge worker (launched by test_multicontroller.py).

One OS process per rank: jax.distributed over a local coordinator, ONE
CPU device per process (a stand-in for a host's chips), per-rank-only
matrix data, setup over the TCP SocketGroup transport, then
DeviceHierarchy.from_spmd + a sharded solve on the GLOBAL mesh. Writes
this rank's solution rows + iteration count to an .npz for the parent
to compare against the in-process oracle.

Usage: python _mc_worker.py <rank> <world> <coord_port> <out.npz> [tap]

With ``tap``, the global mesh is 2-D (world//2 hosts x 2 locals) and the
solve runs the node-aware TAP exchange from level 0 (tap_amg=0) — the
TAP x multi-controller composition (core/tap_comm.cpp under real
multi-rank).
"""

import os
import sys

rank, world, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                               int(sys.argv[3]), sys.argv[4])
tap = len(sys.argv) > 5 and sys.argv[5] == "tap"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=world, process_id=rank)

import numpy as np  # noqa: E402

from raptor_tpu.comm.multiproc import MultiProcessTransport  # noqa: E402
from raptor_tpu.comm.netgroup import SocketGroup  # noqa: E402
from raptor_tpu.comm.spmd import spmd_rs_setup  # noqa: E402
from raptor_tpu.comm.transport import split_rows  # noqa: E402
from raptor_tpu.core.par_matrix import ParCSRMatrix  # noqa: E402
from raptor_tpu.core.partition import Partition  # noqa: E402
from raptor_tpu.core.types import (CoarsenType, InterpType,  # noqa: E402
                                   RelaxType)
from raptor_tpu.device import par as dpar  # noqa: E402
from raptor_tpu.gallery.stencils import (diffusion_stencil_2d,  # noqa: E402
                                         stencil_grid)
from raptor_tpu.multilevel.device_hierarchy import (  # noqa: E402
    DeviceHierarchy)
from raptor_tpu.utils.glibc_rand import form_rand_weights  # noqa: E402

GRID = (24, 24)

# per-rank-only data: assemble THIS rank's row block and drop the rest
A_full = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), GRID)
n = A_full.n_rows
part = Partition.create(n, n, world)
my_block = split_rows(A_full, part.row_bounds)[rank]
del A_full
a_local = ParCSRMatrix.from_local_rows([my_block], part,
                                       first_shard=rank)
assert a_local.is_local_view

group = SocketGroup(rank, world)


def make_transport(m):
    return MultiProcessTransport(group, m)


w = form_rand_weights(n, 0)
hier = spmd_rs_setup(a_local, w, make_transport,
                     coarsen=CoarsenType.HMIS,
                     interp=InterpType.Extended)

if tap:                                 # 2-D (host, local) GLOBAL mesh
    mesh = dpar.make_mesh2(world // 2, 2)
    dh = DeviceHierarchy.from_spmd(hier, mesh, make_transport,
                                   relax_type=RelaxType.Chebyshev,
                                   tap_amg=0)
else:
    mesh = dpar.make_mesh(world)        # the GLOBAL device mesh
    dh = DeviceHierarchy.from_spmd(hier, mesh, make_transport,
                                   relax_type=RelaxType.Chebyshev)

r0, r1 = int(part.row_bounds[rank]), int(part.row_bounds[rank + 1])
b_local = np.asarray(my_block.to_scipy() @ np.ones(n))
bd = dh.vector_local([b_local])
x0 = dh.vector_local([np.zeros(r1 - r0)])
res = dh.solve(x0, bd)

# this process's addressable slice of the global solution
shard = res.x.addressable_shards[0]
x_local = np.asarray(shard.data)[0, :r1 - r0]
hist = np.asarray(res.res)
np.savez(out_path, rank=rank, r0=r0, r1=r1, x=x_local,
         n_iters=int(res.n_iters), hist=hist[hist >= 0.0])
print(f"rank {rank}: solved in {int(res.n_iters)} cycles", flush=True)
