"""Device smoothers vs a NumPy oracle of the reference's hybrid semantics
(par_relax.cpp: frozen halo per sweep, GS within the shard)."""

import numpy as np
import pytest

from raptor_tpu.device import par as dpar
from raptor_tpu.device.relax import build_relax, relax
from raptor_tpu.gallery.stencils import diffusion_stencil_2d, par_stencil_grid


def host_relax(A, x, b, kind, num_sweeps, omega):
    """Sequential NumPy implementation of the reference smoothers."""
    x = x.copy()
    part = A.partition
    shards = A.shards()
    for _ in range(num_sweeps):
        x_old = x.copy()  # halo values frozen at sweep start
        for s, blk in enumerate(shards):
            r0 = part.first_local_row(s)
            n = blk.local_num_rows
            on = blk.on_proc.to_scipy()
            off = blk.off_proc.to_scipy()
            dist = x_old[blk.off_proc_column_map]
            xs = x[r0:r0 + n].copy()
            ys = b[r0:r0 + n]
            diag = on.diagonal()
            if kind == "jacobi":
                row_sum = on @ xs - diag * xs + off @ dist
                upd = (1 - omega) * xs + omega * (ys - row_sum) / diag
                xs = np.where(np.abs(diag) > 1e-16, upd, xs)
            else:
                sweeps = ["fwd"] if kind == "sor" else ["fwd", "bwd"]
                for sw in sweeps:
                    order = range(n) if sw == "fwd" else range(n - 1, -1, -1)
                    for i in order:
                        cols = on.indices[on.indptr[i]:on.indptr[i + 1]]
                        vals = on.data[on.indptr[i]:on.indptr[i + 1]]
                        sel = cols != i
                        row_sum = vals[sel] @ xs[cols[sel]]
                        row_sum += (off.data[off.indptr[i]:off.indptr[i + 1]]
                                    @ dist[off.indices[off.indptr[i]:
                                                       off.indptr[i + 1]]])
                        if sw == "fwd":
                            # reference's non-standard forward update
                            xs[i] = (xs[i] + omega * (ys[i] - xs[i] - row_sum)
                                     ) / diag[i]
                        else:
                            xs[i] = ((1 - omega) * xs[i]
                                     + omega * (ys[i] - row_sum) / diag[i])
            x[r0:r0 + n] = xs
    return x


@pytest.mark.parametrize("n_shards", [1, 4, 8])
@pytest.mark.parametrize("kind", ["jacobi", "sor", "ssor"])
def test_relax_matches_oracle(n_shards, kind):
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (25, 25),
                         n_shards)
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    dRX = build_relax(A, mesh, dA)
    part = A.partition

    rng = np.random.default_rng(42)
    xh = rng.standard_normal(A.global_num_rows)
    bh = rng.standard_normal(A.global_num_rows)

    x = dpar.device_put_vector(xh, part.row_bounds, dA.rows_pad, mesh)
    b = dpar.device_put_vector(bh, part.row_bounds, dA.rows_pad, mesh)
    out = relax(mesh, kind, dA, dRX, x, b, num_sweeps=3, omega=0.9)

    expected = host_relax(A, xh, bh, kind, 3, 0.9)
    np.testing.assert_allclose(
        dpar.host_vector(out, part.row_bounds), expected, atol=1e-12)


def test_relax_smooths_error():
    """A smoother must damp (random, high-frequency) error: solve Ax=0 from
    a random start and check the error norm drops substantially."""
    A = par_stencil_grid(diffusion_stencil_2d(1.0, 0.0), (20, 20), 4)
    mesh = dpar.make_mesh(4)
    dA = dpar.device_put_matrix(A, mesh)
    dRX = build_relax(A, mesh, dA)
    part = A.partition
    rng = np.random.default_rng(7)
    xh = rng.standard_normal(A.global_num_rows)
    x = dpar.device_put_vector(xh, part.row_bounds, dA.rows_pad, mesh)
    b = dpar.device_put_vector(np.zeros_like(xh), part.row_bounds,
                               dA.rows_pad, mesh)
    out = relax(mesh, "ssor", dA, dRX, x, b, num_sweeps=10, omega=1.0)
    err = np.linalg.norm(dpar.host_vector(out, part.row_bounds))
    assert err < 0.3 * np.linalg.norm(xh)


@pytest.mark.parametrize("n_shards", [1, 4])
def test_l1_jacobi_matches_oracle(n_shards):
    """l1-Jacobi: x += w (b - A x) / (a_ii + sum_{j != i} |a_ij|)."""
    A = par_stencil_grid(diffusion_stencil_2d(0.001, np.pi / 8), (25, 25),
                         n_shards)
    mesh = dpar.make_mesh(n_shards)
    dA = dpar.device_put_matrix(A, mesh)
    dRX = build_relax(A, mesh, dA)
    part = A.partition
    rng = np.random.default_rng(3)
    xh = rng.standard_normal(A.global_num_rows)
    bh = rng.standard_normal(A.global_num_rows)
    x = dpar.device_put_vector(xh, part.row_bounds, dA.rows_pad, mesh)
    b = dpar.device_put_vector(bh, part.row_bounds, dA.rows_pad, mesh)
    out = relax(mesh, "l1_jacobi", dA, dRX, x, b, num_sweeps=2, omega=0.8)

    gm = A.global_csr.to_scipy()
    diag = gm.diagonal()
    l1 = diag + (np.abs(gm).sum(axis=1).A1 - np.abs(diag))
    exp = xh.copy()
    for _ in range(2):
        exp = exp + 0.8 * (bh - gm @ exp) / l1
    np.testing.assert_allclose(
        dpar.host_vector(out, part.row_bounds), exp, atol=1e-12)


def test_chebyshev_smooths_error():
    A = par_stencil_grid(diffusion_stencil_2d(1.0, 0.0), (20, 20), 4)
    mesh = dpar.make_mesh(4)
    dA = dpar.device_put_matrix(A, mesh)
    dRX = build_relax(A, mesh, dA)
    part = A.partition
    rng = np.random.default_rng(7)
    xh = rng.standard_normal(A.global_num_rows)
    x = dpar.device_put_vector(xh, part.row_bounds, dA.rows_pad, mesh)
    b = dpar.device_put_vector(np.zeros_like(xh), part.row_bounds,
                               dA.rows_pad, mesh)
    out = relax(mesh, "chebyshev", dA, dRX, x, b, num_sweeps=4, omega=1.0)
    err = np.linalg.norm(dpar.host_vector(out, part.row_bounds))
    assert err < 0.3 * np.linalg.norm(xh)
