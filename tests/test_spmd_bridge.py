"""SPMD setup -> device solve bridge (DeviceHierarchy.from_spmd).

The round-2 gap this closes: a per-rank SpmdHierarchy now feeds the
device solve directly — each controller packs/uploads ONLY its local
level slices, pad dims are agreed over the Transport, and the sharded
V-cycle runs on the global mesh. Here the bridge is validated
in-process (InProcessTransport = the tr-driven code path with every
shard local) against the classic ParMultilevel -> DeviceHierarchy
route; the true multi-controller run (2 OS processes, jax.distributed,
SocketGroup TCP transport) lives in test_multicontroller.py.
"""

import numpy as np
import pytest

from raptor_tpu.comm.plan import build_comm_plan, build_comm_plan_spmd
from raptor_tpu.comm.spmd import spmd_rs_setup, spmd_sa_setup
from raptor_tpu.comm.transport import InProcessTransport
from raptor_tpu.core.par_matrix import par_matrix_from_scipy
from raptor_tpu.core.types import CoarsenType, InterpType, RelaxType
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, stencil_grid
from raptor_tpu.multilevel.device_hierarchy import DeviceHierarchy
from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver
from raptor_tpu.utils.glibc_rand import form_rand_weights


def _problem(n_shards, grid=(40, 40)):
    A = stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), grid)
    Ap = par_matrix_from_scipy(A.to_scipy(), n_shards)
    w = form_rand_weights(Ap.global_num_rows, 0)
    return Ap, w


@pytest.mark.parametrize("n_shards", [1, 4, 8])
def test_comm_plan_spmd_equals_inprocess(n_shards):
    """The rank-local handshake plan builder is value-identical to the
    host-global one when every shard is local."""
    Ap, _ = _problem(n_shards)
    ref = build_comm_plan(Ap, lane_pad=1)
    got = build_comm_plan_spmd(Ap, InProcessTransport(Ap), lane_pad=1)
    for f in ("slot", "halo_pad"):
        assert getattr(got, f) == getattr(ref, f), f
    for f in ("send_idx", "send_mask", "halo_src", "halo_mask",
              "slot_to_halo", "recv_mask", "n_halo"):
        np.testing.assert_array_equal(getattr(got, f), getattr(ref, f), f)


@pytest.mark.parametrize("coarsen,interp", [
    (CoarsenType.HMIS, InterpType.Extended),
    (CoarsenType.CLJP, InterpType.ModClassical)])
def test_from_spmd_matches_device_hierarchy(coarsen, interp):
    """from_spmd (transport-driven packing/upload) solves identically to
    the classic ParMultilevel -> DeviceHierarchy route."""
    n_shards = 4
    Ap, w = _problem(n_shards)
    mesh = dpar.make_mesh(n_shards)
    b = Ap.mult(np.ones(Ap.global_num_rows))

    # classic route (distributed setup mode = the same setup algorithms)
    ml = ParRugeStubenSolver(0.25, coarsen, interp,
                             relax_type=RelaxType.Chebyshev)
    ml.setup_mode = "distributed"
    ml.weights = w
    ml.setup(Ap)
    dh_ref = DeviceHierarchy(ml, mesh)
    r_ref = dh_ref.solve(dh_ref.vector(np.zeros_like(b)),
                         dh_ref.vector(b))

    # bridge route: whole-hierarchy SPMD setup -> from_spmd
    hier = spmd_rs_setup(Ap, w, InProcessTransport, coarsen=coarsen,
                         interp=interp)
    dh = DeviceHierarchy.from_spmd(hier, mesh, InProcessTransport,
                                   relax_type=RelaxType.Chebyshev)
    assert len(dh.levels) == len(dh_ref.levels)
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))

    assert int(r.n_iters) == int(r_ref.n_iters)
    np.testing.assert_allclose(np.asarray(r.x), np.asarray(r_ref.x),
                               rtol=1e-10, atol=1e-12)
    # the local-vector entry point produces the same placement
    bounds = Ap.partition.row_bounds
    b_locs = [b[int(bounds[s]):int(bounds[s + 1])]
              for s in range(n_shards)]
    bd2 = dh.vector_local(b_locs)
    np.testing.assert_array_equal(np.asarray(bd2),
                                  np.asarray(dh.vector(b)))


def test_from_spmd_sa():
    """The SA whole-hierarchy SPMD setup also feeds the bridge."""
    n_shards = 4
    Ap, w = _problem(n_shards, grid=(30, 30))
    mesh = dpar.make_mesh(n_shards)
    hier = spmd_sa_setup(Ap, w, InProcessTransport, theta=0.25)
    dh = DeviceHierarchy.from_spmd(hier, mesh, InProcessTransport,
                                   relax_type=RelaxType.Chebyshev,
                                   num_smooth_sweeps=2)
    b = Ap.mult(np.ones(Ap.global_num_rows))
    r = dh.solve(dh.vector(np.zeros_like(b)), dh.vector(b))
    hist = np.asarray(r.res)
    hist = hist[hist >= 0]
    assert hist[-1] < 1e-7 and int(r.n_iters) < 60
