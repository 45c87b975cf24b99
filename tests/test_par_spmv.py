"""Sharded device SpMV vs golden vectors at 1/4/8 shards.

Mirrors util/tests/test_par_spmv_{aniso,laplacian,random}.cpp and
test_tap_spmv_*.cpp, with mesh shards standing in for MPI ranks."""

import jax
import numpy as np
import pytest

from raptor_tpu.core.par_matrix import par_matrix_from_scipy
from raptor_tpu.device import par as dpar
from raptor_tpu.gallery.io import read_pm
from raptor_tpu.gallery.stencils import (
    diffusion_stencil_2d, laplace_stencil_27pt, par_stencil_grid)

SHARD_COUNTS = [1, 4, 8]


def _matrices(test_data, n_shards):
    return {
        "aniso": par_stencil_grid(
            diffusion_stencil_2d(0.001, np.pi / 8), (25, 25), n_shards),
        "laplacian27": par_stencil_grid(
            laplace_stencil_27pt(), (10, 10, 10), n_shards),
        "random": par_matrix_from_scipy(
            read_pm(test_data / "random.pm").to_scipy(), n_shards),
    }


@pytest.mark.parametrize("n_shards", SHARD_COUNTS)
@pytest.mark.parametrize("name", ["aniso", "laplacian27", "random"])
def test_device_spmv_golden(test_data, n_shards, name):
    A = _matrices(test_data, n_shards)[name]
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    part = A.partition

    for xvec, fwd_file, t_file in [
        (np.ones(A.global_num_cols), f"{name}_ones_b.txt",
         f"{name}_ones_b_T.txt"),
        (np.arange(A.global_num_cols, dtype=np.float64),
         f"{name}_inc_b.txt", f"{name}_inc_b_T.txt"),
    ]:
        x = dpar.device_put_vector(xvec, part.col_bounds, dA.cols_pad, mesh)
        b = dpar.spmv(mesh, dA, x)
        golden = np.loadtxt(test_data / fwd_file)
        np.testing.assert_allclose(
            dpar.host_vector(b, part.row_bounds), golden, atol=1e-6)

        xr = dpar.device_put_vector(xvec, part.row_bounds, dA.rows_pad, mesh)
        bt = dpar.spmv_T(mesh, dA, xr)
        golden_t = np.loadtxt(test_data / t_file)
        np.testing.assert_allclose(
            dpar.host_vector(bt, part.col_bounds), golden_t, atol=1e-6)


@pytest.mark.parametrize("n_shards", SHARD_COUNTS)
def test_device_residual(test_data, n_shards):
    A = _matrices(test_data, n_shards)["aniso"]
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    part = A.partition
    rng = np.random.default_rng(0)
    xh = rng.standard_normal(A.global_num_cols)
    bh = rng.standard_normal(A.global_num_rows)
    x = dpar.device_put_vector(xh, part.col_bounds, dA.cols_pad, mesh)
    b = dpar.device_put_vector(bh, part.row_bounds, dA.rows_pad, mesh)
    r = dpar.residual(mesh, dA, x, b)
    np.testing.assert_allclose(
        dpar.host_vector(r, part.row_bounds),
        bh - A.mult(xh), atol=1e-10)


def test_shard_invariance(test_data):
    """Same answer at every shard count (bitwise-level determinism of the
    sharded schedule vs the serial one)."""
    results = []
    for n in SHARD_COUNTS:
        A = _matrices(test_data, n)["laplacian27"]
        mesh = dpar.make_mesh(n)
        dA = dpar.device_put_matrix(A, mesh)
        x = dpar.device_put_vector(
            np.arange(A.global_num_cols, dtype=np.float64),
            A.partition.col_bounds, dA.cols_pad, mesh)
        b = dpar.spmv(mesh, dA, x)
        results.append(dpar.host_vector(b, A.partition.row_bounds))
    for r in results[1:]:
        np.testing.assert_allclose(r, results[0], rtol=1e-14)


def test_bell_format_forced():
    """BELL (slot-compacted plane blocks) matches the host SpMV when
    forced; auto-selection keeps it opt-in (RAPTOR_TPU_BELL)."""
    import jax.numpy as jnp

    from raptor_tpu.gallery.stencils import laplace_stencil_27pt
    A = par_stencil_grid(laplace_stencil_27pt(), (12, 12, 12), 4)
    mesh = dpar.make_mesh(4)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float64,
                                force_format="bell")
    assert dA.on_format == "bell"
    x = np.random.default_rng(0).random(A.global_num_cols)
    xd = dpar.device_put_vector(x, A.partition.col_bounds, dA.cols_pad,
                                mesh, dtype=jnp.float64)
    y = dpar._shard_op(dpar.spmv_shard, mesh, dA, xd)
    yh = dpar.host_vector(np.asarray(y), A.partition.row_bounds)
    np.testing.assert_allclose(yh, A.mult(x), atol=1e-12)


@pytest.mark.parametrize("n_shards", [1, 4])
def test_well_format_forced(n_shards):
    """Windowed ELL (transfer-operator format) matches the host SpMV and
    SpMV^T when forced, including non-multiple-of-tile row counts."""
    import jax.numpy as jnp

    from raptor_tpu.gallery.stencils import laplace_stencil_27pt
    A = par_stencil_grid(laplace_stencil_27pt(), (14, 14, 14), n_shards)
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh, dtype=jnp.float64,
                                force_format="well")
    assert dA.on_format == "well"
    rng = np.random.default_rng(3)
    x = rng.random(A.global_num_cols)
    xd = dpar.device_put_vector(x, A.partition.col_bounds, dA.cols_pad,
                                mesh, dtype=jnp.float64)
    y = dpar._shard_op(dpar.spmv_shard, mesh, dA, xd)
    yh = dpar.host_vector(np.asarray(y), A.partition.row_bounds)
    np.testing.assert_allclose(yh, A.mult(x), atol=1e-12)
    # transpose path (reconstructed absolute cols)
    r = rng.random(A.global_num_rows)
    rd = dpar.device_put_vector(r, A.partition.row_bounds, dA.rows_pad,
                                mesh, dtype=jnp.float64)
    z = dpar.spmv_T(mesh, dA, rd)
    zh = dpar.host_vector(np.asarray(z), A.partition.col_bounds)
    np.testing.assert_allclose(zh, A.mult_T(r), atol=1e-12)


def test_well_auto_selected_for_3d_transfer():
    """A 3-D extended+i prolongator never lands on per-entry ELL (the
    fallback that was the whole 3-D solve cost). The specific winner is
    platform-dependent under the silicon-calibrated cost model:
    windowed ELL on the XLA path, BELL on TPU (128^3 round-5
    shoot-out: bell 4.85 ms vs well 14.1)."""
    import jax.numpy as jnp

    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.gallery.stencils import laplace_stencil_27pt
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(laplace_stencil_27pt(), (16, 16, 16), 1)
    ml = ParRugeStubenSolver(0.25, CoarsenType.PMIS, InterpType.Extended)
    ml.max_levels = 2
    ml.setup(A)
    P = ml.levels[0].P
    mesh = dpar.make_mesh(1)
    dP = dpar.device_put_matrix(P, mesh, dtype=jnp.float64, embed="cols",
                                need_transpose=False)
    assert dP.on_format in ("well", "bell"), dP.on_format
    x = np.random.default_rng(1).random(P.global_num_cols)
    xd = dpar.device_put_vector(x, P.partition.col_bounds, dP.cols_pad,
                                mesh, dtype=jnp.float64)
    y = dpar._shard_op(dpar.spmv_shard, mesh, dP, xd)
    yh = dpar.host_vector(np.asarray(y), P.partition.row_bounds)
    np.testing.assert_allclose(yh, P.mult(x), atol=1e-12)


@pytest.mark.parametrize("n_shards", [1, 4])
def test_wellt_format_forced(n_shards):
    """Transpose-windowed ELL (the restriction format: forward-packed
    transpose + scatter apply) matches the host SpMV and SpMV^T when
    forced on a restriction-shaped operator."""
    import jax.numpy as jnp

    from raptor_tpu.core.types import CoarsenType, InterpType
    from raptor_tpu.multilevel.par_multilevel import ParRugeStubenSolver

    A = par_stencil_grid(laplace_stencil_27pt(), (14, 14, 14), n_shards)
    ml = ParRugeStubenSolver(0.25, CoarsenType.PMIS, InterpType.Extended)
    ml.max_levels = 2
    ml.setup(A)
    Pt = ml.levels[0].P.transpose()
    mesh = dpar.make_mesh(n_shards)
    dPt = dpar.device_put_matrix(Pt, mesh, dtype=jnp.float64,
                                 force_format="wellt",
                                 need_transpose=False)
    assert dPt.on_format == "wellt"
    rng = np.random.default_rng(3)
    x = rng.random(Pt.global_num_cols)
    xd = dpar.device_put_vector(x, Pt.partition.col_bounds, dPt.cols_pad,
                                mesh, dtype=jnp.float64)
    y = dpar._shard_op(dpar.spmv_shard, mesh, dPt, xd)
    yh = dpar.host_vector(np.asarray(y), Pt.partition.row_bounds)
    np.testing.assert_allclose(yh, Pt.mult(x), atol=1e-12)
    # transpose path (= forward gather over the packed transpose)
    r = rng.random(Pt.global_num_rows)
    rd = dpar.device_put_vector(r, Pt.partition.row_bounds, dPt.rows_pad,
                                mesh, dtype=jnp.float64)
    z = dpar.spmv_T(mesh, dPt, rd)
    zh = dpar.host_vector(np.asarray(z), Pt.partition.col_bounds)
    np.testing.assert_allclose(zh, Pt.mult_T(r), atol=1e-12)


def test_wellt_auto_selected_for_restriction():
    """A restriction-shaped operator that defeats embedding/BDIA
    auto-selects the transpose-windowed format (at production 3-D sizes
    the extended+i P^T lands here too: its forward-layout chunk-8 scan
    is ~10x narrower than packing P^T directly — round-4 shoot-out:
    direct windowed P^T apply was 3.2x the forward P apply). Small 3-D
    grids keep embedded BDIA (fine there); this synthetic case is the
    big-grid regime in miniature."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    rng = np.random.default_rng(5)
    # >256 block offsets defeat BDIA's pad gate (at production 3-D sizes
    # the plane-count/kept-fraction gates fail first); each fine point
    # interpolates from ~4 nearby coarse points
    nf, nc = 34000, 265
    rows, cols = [], []
    for r in range(nf):
        c0 = int(r * nc / nf)
        cs = np.unique(np.clip(c0 + rng.integers(-3, 4, size=4),
                               0, nc - 1))
        cols.extend(cs.tolist())
        rows.extend([r] * len(cs))
    P = sp.csr_matrix((rng.standard_normal(len(rows)), (rows, cols)),
                      shape=(nf, nc))
    Pt = par_matrix_from_scipy(P.T.tocsr(), 1)
    mesh = dpar.make_mesh(1)
    dPt = dpar.device_put_matrix(Pt, mesh, dtype=jnp.float64,
                                 need_transpose=False)
    assert dPt.on_format == "wellt", dPt.on_format
    x = np.random.default_rng(1).random(Pt.global_num_cols)
    xd = dpar.device_put_vector(x, Pt.partition.col_bounds, dPt.cols_pad,
                                mesh, dtype=jnp.float64)
    y = dpar._shard_op(dpar.spmv_shard, mesh, dPt, xd)
    yh = dpar.host_vector(np.asarray(y), Pt.partition.row_bounds)
    np.testing.assert_allclose(yh, Pt.mult(x), atol=1e-12)


def test_wellt_pallas_kernel_interpret():
    """swellt_spmv_T_pallas (interpret mode) matches the XLA scatter
    formulation and scipy to f32 roundoff on restriction-shaped
    operators, including ragged tails and both tile-batch sizes; the
    forward swellt_spmv matches scipy's forward product."""
    import jax.numpy as jnp

    from raptor_tpu.core.matrix import CSRMatrix
    from raptor_tpu.device.formats import (
        swellt_arrays, swellt_spmv, swellt_spmv_T, swellt_stats)
    from raptor_tpu.device.pallas_kernels import swellt_spmv_T_pallas

    rng = np.random.default_rng(7)
    for nf, nc in ((5000, 700), (2200, 180)):
        indptr, idx, dat = [0], [], []
        for r in range(nf):
            c0 = int(r * nc / nf)
            cs = np.unique(np.clip(
                c0 + rng.integers(-6, 7, size=rng.integers(1, 10)),
                0, nc - 1))
            idx.extend(cs.tolist())
            dat.extend(rng.standard_normal(len(cs)).tolist())
            indptr.append(len(idx))
        B = CSRMatrix(nf, nc, np.array(indptr), np.array(idx),
                      np.array(dat))
        T, Kp = swellt_stats(B)
        meta, vals, qb = swellt_arrays(B, Kp, dtype=np.float32)
        meta, vals = jnp.asarray(meta), jnp.asarray(vals)
        qb = jnp.asarray(qb)
        x = jnp.asarray(rng.standard_normal(nf).astype(np.float32))
        ref = swellt_spmv_T(meta, vals, qb, x, nc)
        oracle = B.to_scipy().T @ np.asarray(x, np.float64)
        np.testing.assert_allclose(np.asarray(ref, np.float64), oracle,
                                   atol=1e-4)
        for tb in (8, 16):
            out = swellt_spmv_T_pallas(meta, vals, qb, x, nc,
                                       tb=tb, interpret=True)
            np.testing.assert_allclose(np.asarray(out),
                                       np.asarray(ref), atol=1e-4)
        # forward path (the spmv_T of a wellt-packed matrix)
        xc = jnp.asarray(rng.standard_normal(nc).astype(np.float32))
        yf = swellt_spmv(meta, vals, qb, xc, nf)
        np.testing.assert_allclose(
            np.asarray(yf, np.float64), B.to_scipy() @ np.asarray(xc),
            atol=1e-4)


def test_bell_pallas_kernel_interpret():
    """bell_spmv_pallas (interpret mode) is bit-equal to the XLA BELL
    formulation on an unstructured operator with padding tails."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from raptor_tpu.core.matrix import CSRMatrix
    from raptor_tpu.device.formats import (LANE, bell_arrays, bell_spmv,
                                           bell_stats)
    from raptor_tpu.device.pallas_kernels import bell_spmv_pallas

    rng = np.random.default_rng(11)
    for n in (700, 1024):  # non-multiple and multiple of 128
        m = sp.random(n, n, density=0.02, random_state=5, format="csr")
        m = (m + sp.diags(np.ones(n))).tocsr()
        m.sort_indices()
        a = CSRMatrix.from_scipy(m)
        a128 = -(-n // LANE)
        wb, _ = bell_stats(a)
        src, idx, vals = bell_arrays(a, a128, wb, dtype=np.float32)
        x = rng.random(n).astype(np.float32)
        rows_pad = a128 * LANE
        ref = bell_spmv(jnp.asarray(src), jnp.asarray(idx),
                        jnp.asarray(vals), jnp.asarray(x), rows_pad)
        out = bell_spmv_pallas(jnp.asarray(src), jnp.asarray(idx),
                               jnp.asarray(vals), jnp.asarray(x),
                               rows_pad, interpret=True)
        assert np.array_equal(np.asarray(out), np.asarray(ref))
        oracle = (m @ x.astype(np.float64))[:n]
        np.testing.assert_allclose(np.asarray(out)[:n], oracle, atol=1e-4)

def test_well_bounded_pallas_kernel_interpret():
    """wind_ell_spmv_pallas with per-(tile, slot) scan bounds (interpret
    mode) matches the XLA windowed-ELL formulation to f32 roundoff
    (accumulation order differs: w-outer bounded scans vs XLA's tree
    reduction) — including empty (tile, slot) pairs (fori_loop(0, 0))
    and padding tails."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from raptor_tpu.core.matrix import CSRMatrix
    from raptor_tpu.device.formats import (LANE, wind_ell_arrays,
                                           wind_ell_spmv, wind_ell_stats)
    from raptor_tpu.device.pallas_kernels import wind_ell_spmv_pallas

    rng = np.random.default_rng(7)
    ba = 8
    # banded random (windowed-friendly) with highly variable row lengths
    n = 3000
    diags = {o: rng.random(n) * (rng.random(n) > 0.6)
             for o in (-900, -128, -5, 0, 3, 130, 890)}
    m = sp.diags(list(diags.values()), list(diags.keys()),
                 shape=(n, n), format="csr")
    m.eliminate_zeros()
    m.sort_indices()
    a = CSRMatrix.from_scipy(m)
    W, WR, T, scan = wind_ell_stats(a, n, ba)
    assert scan < W * WR * T  # the bounds actually cut the scan
    ws, rel, vals, jlo, jhi = wind_ell_arrays(
        a, n, W, WR, ba, n, dtype=np.float32)
    x = rng.random(n).astype(np.float32)
    R = rel.shape[1]
    ref = wind_ell_spmv(jnp.asarray(ws), jnp.asarray(rel),
                        jnp.asarray(vals), jnp.asarray(x), ba, WR, R)
    out = wind_ell_spmv_pallas(jnp.asarray(ws), jnp.asarray(rel),
                               jnp.asarray(vals), jnp.asarray(x),
                               WR, ba, R, jlo=jnp.asarray(jlo),
                               jhi=jnp.asarray(jhi), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    oracle = m @ x.astype(np.float64)
    np.testing.assert_allclose(np.asarray(out)[:n], oracle, atol=1e-4)
