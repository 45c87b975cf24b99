"""Device smoothers: hybrid Jacobi / SOR / SSOR.

Semantics match the reference's hybrid smoothers exactly
(util/linalg/par_relax.cpp): halo values are exchanged once per sweep and
frozen; the on_proc part is Jacobi (jacobi_helper :121-172) or a sequential
Gauss-Seidel sweep (SOR_forward :44-83, SOR_backward :85-119). Note the
reference's forward sweep uses the non-standard update
``x[i] = (x[i] + w*(y[i] - x[i] - rowsum)) / a_ii`` (par_relax.cpp:81) —
reproduced here verbatim; the backward sweep uses the standard weighted form.

TPU-native realization of the *sequential* on-shard sweep: the forward sweep
is the lower-triangular solve ``(D + w L) x_new = c`` with
``c = x + w*(y - x - U x - A_off dist_x)``. At setup the host computes a
**level schedule** of the L-dependency DAG; on device the sweep is a
``fori_loop`` over levels, each level a fully-parallel padded
gather-multiply-scatter. This keeps shapes static and the math bit-identical
to the row-ordered sequential sweep.

Rows whose first on_proc entry is not the diagonal are left untouched, as in
the reference (par_relax.cpp:58-64).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix
from raptor_tpu.core.types import ZERO_TOL
from raptor_tpu.device import par as dpar
from raptor_tpu.device.formats import ell_arrays, ell_spmv, off_spmv
from raptor_tpu.device.par import DeviceParCSR, halo_exchange


def _np(x, npdt):
    return np.asarray(x, dtype=npdt)


def _split_ldu(a: CSRMatrix) -> Tuple[np.ndarray, CSRMatrix, CSRMatrix]:
    """diag, strict lower L, strict upper U of a local square block."""
    sp_a = a.to_scipy()
    import scipy.sparse as sp
    diag = sp_a.diagonal()
    lower = sp.tril(sp_a, k=-1, format="csr")
    upper = sp.triu(sp_a, k=1, format="csr")
    return diag, CSRMatrix.from_scipy(lower), CSRMatrix.from_scipy(upper)


def _greedy_coloring(a: CSRMatrix) -> np.ndarray:
    """Greedy graph coloring of the symmetrized on_proc pattern (smallest
    available color in row order). Stencil blocks need only a few colors —
    the multicolor GS sweep is then a handful of fully-parallel steps."""
    import scipy.sparse as sp
    m = a.to_scipy()
    sym = (m + m.T).tocsr()
    sym.sort_indices()
    from raptor_tpu import native
    if native.available():
        return native.greedy_coloring(sym.indptr, sym.indices)
    n = a.n_rows
    colors = np.full(n, -1, dtype=np.int64)
    for i in range(n):
        nb = sym.indices[sym.indptr[i]:sym.indptr[i + 1]]
        used = set(colors[nb[nb < i]].tolist()) | (
            set(colors[nb].tolist()) - {-1})
        c = 0
        while c in used:
            c += 1
        colors[i] = c
    return colors


def _level_schedule(tri: CSRMatrix, reverse: bool) -> List[np.ndarray]:
    """Group rows into dependency levels of a triangular solve.

    Forward (reverse=False): row i depends on cols j < i (lower tri).
    Backward (reverse=True): row i depends on cols j > i (upper tri).
    Rows in the same level have no dependencies among themselves and are
    updated in parallel; the device loops over levels in order.
    """
    n = tri.n_rows
    from raptor_tpu import native
    if native.available():
        level = native.level_schedule(tri.indptr, tri.indices, reverse)
    else:
        level = np.zeros(n, dtype=np.int64)
        order = range(n - 1, -1, -1) if reverse else range(n)
        indptr, indices = tri.indptr, tri.indices
        for i in order:
            s, e = indptr[i], indptr[i + 1]
            if e > s:
                level[i] = level[indices[s:e]].max() + 1
    n_levels = int(level.max()) + 1 if n else 1
    counts = np.bincount(level, minlength=n_levels)
    order = np.argsort(level, kind="stable")
    return np.split(order, np.cumsum(counts)[:-1])


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["diag", "inv_diag", "has_diag", "u_cols", "u_vals",
                 "l_cols", "l_vals",
                 "fwd_rows", "fwd_mask", "fwd_cols", "fwd_vals",
                 "bwd_rows", "bwd_mask", "bwd_cols", "bwd_vals",
                 "color_mask", "inv_l1_diag"],
    meta_fields=["n_fwd_levels", "n_bwd_levels", "n_colors",
                 "cheb_lo", "cheb_hi"],
)
@dataclasses.dataclass
class DeviceRelax:
    """Per-shard relaxation plan (stacked over shards like DeviceParCSR)."""

    diag: jnp.ndarray       # [S, R] (1.0 on padding / missing diag)
    inv_diag: jnp.ndarray   # [S, R]
    has_diag: jnp.ndarray   # [S, R] 1.0 where |diag|>zero_tol and row valid
    u_cols: jnp.ndarray     # strict upper ELL
    u_vals: jnp.ndarray
    l_cols: jnp.ndarray     # strict lower ELL
    l_vals: jnp.ndarray
    # level schedules: [S, NL, M] rows + mask, [S, NL, M, W] entries
    fwd_rows: jnp.ndarray
    fwd_mask: jnp.ndarray
    fwd_cols: jnp.ndarray
    fwd_vals: jnp.ndarray
    bwd_rows: jnp.ndarray
    bwd_mask: jnp.ndarray
    bwd_cols: jnp.ndarray
    bwd_vals: jnp.ndarray
    # greedy graph coloring for multicolor GS: [S, NC, R] one-hot per color
    color_mask: jnp.ndarray
    # l1-Jacobi: 1 / (a_ii + sum_{j != i} |a_ij|) over the FULL row
    # (on_proc + off_proc), hypre's l1 norm smoother
    inv_l1_diag: jnp.ndarray
    n_fwd_levels: int
    n_bwd_levels: int
    n_colors: int
    # Chebyshev interval for D^{-1} A (power-iteration estimate at setup)
    cheb_lo: float
    cheb_hi: float


def _schedule_arrays(tri: CSRMatrix, levels: List[np.ndarray],
                     NL: int, M: int, W: int):
    rows = np.zeros((NL, M), dtype=np.int32)
    mask = np.zeros((NL, M), dtype=np.float64)
    cols = np.zeros((NL, M, W), dtype=np.int32)
    vals = np.zeros((NL, M, W), dtype=np.float64)
    # row-major ELL view of tri, gathered per level (vectorized)
    ec, ev = ell_arrays(tri, tri.n_rows, W)
    ec, ev = ec.T, ev.T                       # [R, W]
    for l, lv in enumerate(levels):
        m = len(lv)
        rows[l, :m] = lv
        mask[l, :m] = 1.0
        cols[l, :m] = ec[lv]
        vals[l, :m] = ev[lv]
    return rows, mask, cols, vals


def _cheb_interval(a: ParCSRMatrix, tr=None):
    """Chebyshev interval: power-iteration estimate of lambda_max of
    D^{-1}A; [0.3*lmax, 1.1*lmax] per hypre practice. Computed
    shard-wise over replicated iterates in BOTH the in-process and SPMD
    paths (identical arithmetic, so a multi-controller hierarchy
    bit-matches the in-process one); SPMD concatenates the per-rank
    slices through the transport."""
    part = a.partition
    shards = a.shards()
    n = part.global_num_rows
    rng_v = np.random.default_rng(42).random(n) + 0.1
    v = rng_v / np.linalg.norm(rng_v)
    invd = []
    for blk in shards:
        d = blk.on_proc.diagonal()
        invd.append(np.where(np.abs(d) > ZERO_TOL, d, 1.0))
    lmax = 1.0
    for _ in range(12):
        locs = []
        for i, blk in enumerate(shards):
            s = a.first_shard + i
            c0, c1 = int(part.col_bounds[s]), int(part.col_bounds[s + 1])
            w = blk.on_proc.mult(v[c0:c1])
            if blk.off_proc.nnz:
                w = w + blk.off_proc.mult(
                    v[np.asarray(blk.off_proc_column_map)])
            locs.append(w / invd[i])
        w_full = (np.concatenate(locs) if tr is None
                  else tr.allgather_concat(locs))
        nw = np.linalg.norm(w_full)
        if nw <= 0:
            break
        lmax, v = nw, w_full / nw
    return 0.3 * float(lmax), 1.1 * float(lmax)


def build_relax(a: ParCSRMatrix, mesh, dA: DeviceParCSR,
                dtype=jnp.float64, need=("tri", "color"),
                tr=None) -> DeviceRelax:
    """Host-side construction of the relaxation plan.

    ``need`` selects the heavy plans: "tri" builds the level-scheduled
    triangular sweeps and L/U ELL blocks (SOR/SSOR/Jacobi row sums),
    "color" the greedy coloring masks (multicolor GS). Chebyshev and
    l1-Jacobi need neither — skipping them saves O(nnz)-scale arrays
    per level (the difference between fitting 2048^2 in HBM or not).

    ``tr``: SPMD mode (see device_put_matrix) — pack only the local
    shards, agree on pad dims through transport allgathers."""
    shards = a.shards()
    S = len(shards)
    R = dA.rows_pad
    from raptor_tpu.device.par import _gall
    need_tri = "tri" in need
    need_color = "color" in need

    empty = CSRMatrix.empty(1, 1)
    per_shard = []
    colorings = []
    for blk in shards:
        if need_tri:
            diag, low, up = _split_ldu(blk.on_proc)
            fl = _level_schedule(low, reverse=False)
            bl = _level_schedule(up, reverse=True)
        else:
            # Chebyshev / l1-Jacobi only read the diagonal: skip the
            # O(nnz) scipy tril/triu split entirely
            diag = blk.on_proc.diagonal()
            low, up = empty, empty
            fl, bl = [np.zeros(0, dtype=np.int64)], [np.zeros(0,
                                                              np.int64)]
        per_shard.append((diag, low, up, fl, bl))
        colorings.append(_greedy_coloring(blk.on_proc) if need_color
                         else np.zeros(1, dtype=np.int64))
    dims_l = (
        max(1, max(int(c.max()) + 1 if len(c) else 1 for c in colorings)),
        max(len(p[3]) for p in per_shard),
        max(len(p[4]) for p in per_shard),
        max(max((len(lv) for lv in p[3]), default=1) for p in per_shard),
        max(max((len(lv) for lv in p[4]), default=1) for p in per_shard),
        max(1, max((int(np.diff(p[1].indptr).max()) if p[1].nnz else 0)
                   for p in per_shard)),
        max(1, max((int(np.diff(p[2].indptr).max()) if p[2].nnz else 0)
                   for p in per_shard)),
    )
    NC, NLf, NLb, Mf, Mb, Wl, Wu = (
        max(d) for d in zip(*_gall(tr, dims_l)))

    diag_a = np.ones((S, R))
    has = np.zeros((S, R))
    u_cols = np.zeros((S, Wu, R), dtype=np.int32)
    u_vals = np.zeros((S, Wu, R))
    l_cols = np.zeros((S, Wl, R), dtype=np.int32)
    l_vals = np.zeros((S, Wl, R))
    f_rows = np.zeros((S, NLf, Mf), dtype=np.int32)
    f_mask = np.zeros((S, NLf, Mf))
    f_cols = np.zeros((S, NLf, Mf, Wl), dtype=np.int32)
    f_vals = np.zeros((S, NLf, Mf, Wl))
    b_rows = np.zeros((S, NLb, Mb), dtype=np.int32)
    b_mask = np.zeros((S, NLb, Mb))
    b_cols = np.zeros((S, NLb, Mb, Wu), dtype=np.int32)
    b_vals = np.zeros((S, NLb, Mb, Wu))
    color_mask = np.zeros((S, NC, R))
    if need_color:
        for s_i, c in enumerate(colorings):
            color_mask[s_i, c, np.arange(len(c))] = 1.0

    for s, (diag, low, up, fl, bl) in enumerate(per_shard):
        n = len(diag)
        diag_a[s, :n] = np.where(np.abs(diag) > ZERO_TOL, diag, 1.0)
        has[s, :n] = (np.abs(diag) > ZERO_TOL).astype(np.float64)
        u_cols[s], u_vals[s] = ell_arrays(up, R, Wu)
        l_cols[s], l_vals[s] = ell_arrays(low, R, Wl)
        f_rows[s], f_mask[s], f_cols[s], f_vals[s] = _schedule_arrays(
            low, fl, NLf, Mf, Wl)
        b_rows[s], b_mask[s], b_cols[s], b_vals[s] = _schedule_arrays(
            up, bl, NLb, Mb, Wu)

    # l1 row norms over the full (on + off) row, hypre l1-Jacobi style
    l1 = np.ones((S, R))
    for s, blk in enumerate(shards):
        n = blk.on_proc.n_rows
        onab = np.bincount(blk.on_proc.row_ids(),
                           weights=np.abs(blk.on_proc.data), minlength=n)
        offab = (np.bincount(blk.off_proc.row_ids(),
                             weights=np.abs(blk.off_proc.data), minlength=n)
                 if blk.off_proc.nnz else np.zeros(n))
        d = diag_a[s, :n]
        row_l1 = d + (onab - np.abs(d)) + offab
        l1[s, :n] = np.where(np.abs(row_l1) > ZERO_TOL, row_l1, 1.0)

    cheb_lo, cheb_hi = _cheb_interval(a, tr=tr)

    # one batched device_put for every leaf (per-leaf puts pay the
    # host->device round trip ~17x per level)
    import jax
    npdt = np.dtype(jax.dtypes.canonicalize_dtype(dtype))
    staged = dict(
        diag=_np(diag_a, npdt), inv_diag=_np(1.0 / diag_a, npdt),
        has_diag=_np(has, npdt), inv_l1_diag=_np(1.0 / l1, npdt),
        u_cols=u_cols, u_vals=_np(u_vals, npdt),
        l_cols=l_cols, l_vals=_np(l_vals, npdt),
        fwd_rows=f_rows, fwd_mask=_np(f_mask, npdt),
        fwd_cols=f_cols, fwd_vals=_np(f_vals, npdt),
        bwd_rows=b_rows, bwd_mask=_np(b_mask, npdt),
        bwd_cols=b_cols, bwd_vals=_np(b_vals, npdt),
        color_mask=_np(color_mask, npdt),
    )
    dev = dpar.put_stacked(staged, mesh, tr=tr, first_shard=a.first_shard)
    return DeviceRelax(
        cheb_lo=cheb_lo, cheb_hi=cheb_hi,
        n_fwd_levels=NLf, n_bwd_levels=NLb, n_colors=NC,
        **dev,
    )


# --- shard-level smoother kernels ---------------------------------------------

def _halo(A, x, T=None):
    if T is not None:
        from raptor_tpu.comm.tap import tap_halo_exchange
        return tap_halo_exchange(T, x)
    return halo_exchange(A, x)


def jacobi_shard(A: DeviceParCSR, RX: DeviceRelax, x, b, num_sweeps: int,
                 omega: float, T=None):
    """Hybrid Jacobi (jacobi_helper, par_relax.cpp:121-172)."""
    def sweep(_, x):
        dist = _halo(A, x, T)
        row_sum = (ell_spmv(RX.l_cols, RX.l_vals, x)
                   + ell_spmv(RX.u_cols, RX.u_vals, x)
                   + off_spmv(A.off_rows, A.off_cols, A.off_vals, dist,
                              A.rows_pad))
        x_new = (1.0 - omega) * x + omega * (b - row_sum) * RX.inv_diag
        return jnp.where(RX.has_diag > 0, x_new, x)
    return jax.lax.fori_loop(0, num_sweeps, sweep, x)


def _tri_sweep(x, c, omega, rows, mask, cols, vals, inv_diag, has_diag,
               n_levels, backward_form=False, diag=None):
    """Level-scheduled triangular sweep.

    forward:  x[i] = (c[i] - w * L x[i]) / a_ii
    backward: x[i] = c[i] + (w * (-U x)[i]) / a_ii  (c holds the w(y-Lx-off)/d
              part already divided; see ssor_shard)
    """
    def body(l, x):
        r = rows[l]                       # [M]
        m = mask[l]
        lsum = (vals[l] * x[cols[l]]).sum(axis=-1)   # [M]
        if backward_form:
            xi = c[r] - omega * lsum * inv_diag[r]
        else:
            xi = (c[r] - omega * lsum) * inv_diag[r]
        ok = m * has_diag[r]
        # add-delta instead of set: padded schedule slots all target row 0
        # with delta 0, so duplicate writes stay deterministic
        x = x.at[r].add(jnp.where(ok > 0, xi - x[r], 0.0))
        return x
    return jax.lax.fori_loop(0, n_levels, body, x)


def sor_forward_shard(A: DeviceParCSR, RX: DeviceRelax, x, y, dist, omega):
    """SOR_forward (par_relax.cpp:44-83): (D + wL) x_new = c, with the
    reference's non-standard c = x + w*(y - x - U x - off dist)."""
    c = x + omega * (y - x - ell_spmv(RX.u_cols, RX.u_vals, x)
                     - off_spmv(A.off_rows, A.off_cols, A.off_vals, dist,
                                A.rows_pad))
    return _tri_sweep(x, c, omega, RX.fwd_rows, RX.fwd_mask, RX.fwd_cols,
                      RX.fwd_vals, RX.inv_diag, RX.has_diag, RX.n_fwd_levels)


def sor_backward_shard(A: DeviceParCSR, RX: DeviceRelax, x, y, dist, omega):
    """SOR_backward (par_relax.cpp:85-119): standard weighted form
    x[i] = (1-w)x[i] + w(y[i] - Lx - off - U x_new)/a_ii."""
    c = (1.0 - omega) * x + omega * (
        y - ell_spmv(RX.l_cols, RX.l_vals, x)
        - off_spmv(A.off_rows, A.off_cols, A.off_vals, dist,
                   A.rows_pad)) * RX.inv_diag
    return _tri_sweep(x, c, omega, RX.bwd_rows, RX.bwd_mask, RX.bwd_cols,
                      RX.bwd_vals, RX.inv_diag, RX.has_diag,
                      RX.n_bwd_levels, backward_form=True)


def sor_shard(A, RX, x, b, num_sweeps: int, omega: float, T=None):
    """sor_helper (par_relax.cpp:174-186)."""
    def sweep(_, x):
        dist = _halo(A, x, T)
        return sor_forward_shard(A, RX, x, b, dist, omega)
    return jax.lax.fori_loop(0, num_sweeps, sweep, x)


def ssor_shard(A, RX, x, b, num_sweeps: int, omega: float, T=None):
    """ssor_helper (par_relax.cpp:189-200): one halo exchange, then
    forward + backward sweeps with the same frozen halo."""
    def sweep(_, x):
        dist = _halo(A, x, T)
        x = sor_forward_shard(A, RX, x, b, dist, omega)
        x = sor_backward_shard(A, RX, x, b, dist, omega)
        return x
    return jax.lax.fori_loop(0, num_sweeps, sweep, x)


def _mc_color_step(A, RX, x, b, dist, omega, c):
    """Update rows of color c with the latest x (standard multicolor GS)."""
    from raptor_tpu.device.par import on_spmv_shard
    row_sum = (on_spmv_shard(A, x) - RX.diag * x
               + off_spmv(A.off_rows, A.off_cols, A.off_vals, dist,
                          A.rows_pad))
    upd = (1.0 - omega) * x + omega * (b - row_sum) * RX.inv_diag
    m = RX.color_mask[c] * RX.has_diag
    return jnp.where(m > 0, upd, x)


def mc_sor_shard(A, RX, x, b, num_sweeps: int, omega: float, T=None):
    """Multicolor Gauss-Seidel (TPU-native; n_colors fully-parallel steps
    per sweep instead of the sequential wavefront schedule)."""
    def sweep(_, x):
        dist = _halo(A, x, T)
        return jax.lax.fori_loop(
            0, RX.n_colors,
            lambda c, x: _mc_color_step(A, RX, x, b, dist, omega, c), x)
    return jax.lax.fori_loop(0, num_sweeps, sweep, x)


def mc_ssor_shard(A, RX, x, b, num_sweeps: int, omega: float, T=None):
    def sweep(_, x):
        dist = _halo(A, x, T)
        x = jax.lax.fori_loop(
            0, RX.n_colors,
            lambda c, x: _mc_color_step(A, RX, x, b, dist, omega, c), x)
        x = jax.lax.fori_loop(
            0, RX.n_colors,
            lambda c, x: _mc_color_step(A, RX, x, b, dist, omega,
                                        RX.n_colors - 1 - c), x)
        return x
    return jax.lax.fori_loop(0, num_sweeps, sweep, x)


def _full_residual(A, x, b, dist):
    """r = b - A x with the halo values already exchanged."""
    from raptor_tpu.device.par import off_spmv as _off, on_spmv_shard
    return b - (on_spmv_shard(A, x)
                + _off(A.off_rows, A.off_cols, A.off_vals, dist,
                       A.rows_pad))


def l1_jacobi_shard(A, RX, x, b, num_sweeps: int, omega: float, T=None):
    """l1-Jacobi: x += w * (b - A x) / (a_ii + sum_{j!=i} |a_ij|).

    Unconditionally convergent for SPD A (the l1 diagonal dominates the
    row); hypre's default GPU smoother. TPU-native addition — the
    reference offers Jacobi/SOR/SSOR only (util/linalg/par_relax.cpp)."""
    def sweep(_, x):
        dist = _halo(A, x, T)
        r = _full_residual(A, x, b, dist)
        return jnp.where(RX.has_diag > 0,
                         x + omega * r * RX.inv_l1_diag, x)
    return jax.lax.fori_loop(0, num_sweeps, sweep, x)


def chebyshev_shard(A, RX, x, b, num_sweeps: int, omega: float, T=None):
    """Chebyshev polynomial smoother of degree ``num_sweeps`` on the
    interval [cheb_lo, cheb_hi] of D^{-1}A (power-iteration bound at
    setup). One SpMV per degree, no color sweeps — the standard
    accelerator AMG smoother. ``omega`` is unused (the polynomial fixes
    the weights)."""
    degree = max(1, num_sweeps)
    theta = 0.5 * (RX.cheb_hi + RX.cheb_lo)
    delta = 0.5 * (RX.cheb_hi - RX.cheb_lo)
    sigma = theta / delta

    dist = _halo(A, x, T)
    r = _full_residual(A, x, b, dist)
    z = r * RX.inv_diag * RX.has_diag
    d = z / theta
    x = x + d
    rho = 1.0 / sigma
    for _ in range(1, degree):
        dist = _halo(A, d, T)
        r = r - _ad(A, d, dist)
        z = r * RX.inv_diag * RX.has_diag
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * z
        x = x + d
        rho = rho_new
    return x


def _ad(A, d, dist):
    from raptor_tpu.device.par import off_spmv as _off, on_spmv_shard
    return (on_spmv_shard(A, d)
            + _off(A.off_rows, A.off_cols, A.off_vals, dist, A.rows_pad))


RELAX_FNS = {
    "jacobi": jacobi_shard,
    "sor": sor_shard,
    "ssor": ssor_shard,
    "mc_sor": mc_sor_shard,
    "mc_ssor": mc_ssor_shard,
    "l1_jacobi": l1_jacobi_shard,
    "chebyshev": chebyshev_shard,
}


# --- jitted global entry points ----------------------------------------------

@functools.partial(jax.jit,
                   static_argnames=("mesh", "kind", "num_sweeps", "omega"))
def relax(mesh, kind: str, A: DeviceParCSR, RX: DeviceRelax, x, b,
          num_sweeps: int = 1, omega: float = 1.0):
    """Global smoother application (par_relax.cpp:216-290 entry points)."""
    fn = RELAX_FNS[kind]

    def shard_fn(A, RX, x, b):
        out = fn(A, RX, x[0], b[0], num_sweeps, omega)
        return out[None]

    def body(A, RX, x, b):
        A = jax.tree.map(lambda l: l[0], A)
        RX = jax.tree.map(lambda l: l[0], RX)
        return shard_fn(A, RX, x, b)

    from jax.sharding import PartitionSpec as P
    args = (A, RX, x, b)
    return jax.shard_map(body, mesh=mesh, in_specs=dpar.leaf_specs(args),
                         out_specs=P(dpar.ROW_AXIS, None))(*args)
