"""Problem gallery: structured stencil matrices.

Equivalents of the reference's gallery (gallery/diffusion.cpp,
gallery/laplacian27pt.cpp, gallery/stencil.cpp:8, gallery/par_stencil.cpp:6).
The assembly is vectorized NumPy instead of per-row loops: a stencil entry at
offset vector ``o`` contributes value ``stencil[-o]`` to ``A[i, i+dot(o,strides)]``
wherever all coordinates ``c + o`` stay inside the grid (zero Dirichlet
boundary), which is exactly the reference's len/step boundary-zeroing loops
(gallery/stencil.cpp:100-167) in closed form.
"""

from __future__ import annotations

import itertools

import numpy as np
import scipy.sparse as sp

from raptor_tpu.core.matrix import CSRMatrix
from raptor_tpu.core.par_matrix import ParCSRMatrix, par_matrix_from_scipy
from raptor_tpu.core.types import ZERO_TOL


def diffusion_stencil_2d(eps: float = 1.0, theta: float = 0.0) -> np.ndarray:
    """Rotated anisotropic diffusion Q1 FE stencil
    (gallery/diffusion.cpp:55-82). Returns a length-9 array (3x3 row-major)."""
    c, s = np.cos(theta), np.sin(theta)
    cs, cc, ss = c * s, c * c, s * s
    val1 = ((-1 * eps - 1) * cc + (-1 * eps - 1) * ss + (3 * eps - 3) * cs) / 6.0
    val2 = ((2 * eps - 4) * cc + (-4 * eps + 2) * ss) / 6.0
    val3 = ((-1 * eps - 1) * cc + (-1 * eps - 1) * ss + (-3 * eps + 3) * cs) / 6.0
    val4 = ((-4 * eps + 2) * cc + (2 * eps - 4) * ss) / 6.0
    val5 = ((8 * eps + 8) * cc + (8 * eps + 8) * ss) / 6.0
    return np.array([val1, val2, val3, val4, val5, val4, val3, val2, val1])


def laplace_stencil_27pt() -> np.ndarray:
    """27-point 3-D Laplacian stencil (gallery/laplacian27pt.cpp:22-34)."""
    st = np.full(27, -1.0)
    st[13] = 26.0
    return st


def stencil_grid(stencil: np.ndarray, grid, dim: int = None) -> CSRMatrix:
    """Assemble the stencil operator on a ``grid`` with zero Dirichlet
    boundaries (gallery/stencil.cpp:8-196). Row-major grid ordering:
    dimension 0 is outermost."""
    grid = list(grid)
    if dim is None:
        dim = len(grid)
    stencil = np.asarray(stencil, dtype=np.float64).ravel()
    assert len(stencil) == 3 ** dim

    # large outputs (1.3 GB at 128^3): route them through the persistent
    # heap arena so later setup passes reuse the pages instead of
    # re-faulting fresh mmaps (utils/hostmem.py; setup pins too, but by
    # then the assembly buffers are already individual mmap regions)
    from raptor_tpu.utils.hostmem import pin_arena
    pin_arena()

    n_v = int(np.prod(grid))
    # stride of dimension d in the flattened row index
    strides = np.ones(dim, dtype=np.int64)
    for d in range(dim - 2, -1, -1):
        strides[d] = strides[d + 1] * grid[d + 1]

    # coordinates of every row, per dimension
    idx = np.arange(n_v, dtype=np.int64)
    coords = [(idx // strides[d]) % grid[d] for d in range(dim)]
    # boundary-validity masks per (dimension, +-1 offset)
    hi = [coords[d] < grid[d] - 1 for d in range(dim)]
    lo = [coords[d] > 0 for d in range(dim)]

    entries = []  # (diag, val, offs) for each nonzero stencil entry
    for flat, offs in enumerate(itertools.product((-1, 0, 1), repeat=dim)):
        # stencil value applied at offset `offs` is the entry at the
        # *reversed* position (stencil.cpp:171-180: value = data[N_s-d-1]).
        val = stencil[3 ** dim - 1 - flat]
        if abs(val) <= ZERO_TOL:
            continue
        diag = sum(int(o) * int(strides[d]) for d, o in enumerate(offs))
        entries.append((diag, float(val), offs))

    diags = np.array([e[0] for e in entries], dtype=np.int64)
    if len(entries) and len(np.unique(diags)) == len(entries):
        # Fast path: every offset contributes a CONSTANT column-row diagonal
        # and the diagonals are distinct, so the CSR comes out directly in
        # sorted order from a [n, K] validity mask — no COO, no global sort
        # (the scipy coo->csr route costs ~30 s at 128^3). One flatnonzero
        # over valid.ravel() yields row-major nnz positions; the offset id
        # is position % K, so indices/data are two small-table gathers.
        order = np.argsort(diags, kind="stable")
        K = len(entries)
        from raptor_tpu import native
        if native.available():
            # one C pass: no masks, no nonzero, no fancy gathers (those
            # run at ~20 Melem/s on this host -- tens of seconds at 128^3)
            dcols = np.array([entries[o][0] for o in order], dtype=np.int64)
            dvals = np.array([entries[o][1] for o in order])
            offs = np.array([entries[o][2] for o in order], dtype=np.int64)
            indptr, indices, data = native.stencil_csr(
                np.asarray(grid, dtype=np.int64), dcols, dvals, offs)
            return CSRMatrix(n_v, n_v, indptr, indices, data)
        valid_t = np.empty((K, n_v), dtype=bool)  # [K, n] contiguous rows
        dcols = np.empty(K, dtype=np.int64)
        dvals = np.empty(K, dtype=np.float64)
        for j, o in enumerate(order):
            diag, val, offs = entries[o]
            row = valid_t[j]
            row[:] = True
            for d, oo in enumerate(offs):
                if oo == 1:
                    row &= hi[d]
                elif oo == -1:
                    row &= lo[d]
            dcols[j] = diag
            dvals[j] = val
        valid = np.ascontiguousarray(valid_t.T)
        rowk, jk = np.nonzero(valid)  # row-major -> CSR order directly
        indices = dcols[jk]
        indices += rowk
        data = dvals[jk]
        indptr = np.zeros(n_v + 1, dtype=np.int64)
        np.cumsum(valid.sum(axis=1, dtype=np.int64), out=indptr[1:])
        return CSRMatrix(n_v, n_v, indptr, indices, data)

    rows_list, cols_list, vals_list = [], [], []
    for diag, val, offs in entries:
        mask = np.ones(n_v, dtype=bool)
        for d, o in enumerate(offs):
            if o == 1:
                mask &= hi[d]
            elif o == -1:
                mask &= lo[d]
        r = idx[mask]
        rows_list.append(r)
        cols_list.append(r + diag)
        vals_list.append(np.full(len(r), val))
    m = sp.csr_matrix(
        (np.concatenate(vals_list),
         (np.concatenate(rows_list), np.concatenate(cols_list))),
        shape=(n_v, n_v))
    m.sum_duplicates()
    m.sort_indices()
    return CSRMatrix.from_scipy(m)


def par_stencil_grid(stencil: np.ndarray, grid, n_shards: int,
                     dim: int = None) -> ParCSRMatrix:
    """Distributed stencil operator (gallery/par_stencil.cpp:6-228)."""
    from raptor_tpu.core.partition import Partition
    a = stencil_grid(stencil, grid, dim)
    return ParCSRMatrix(a, Partition.create(a.n_rows, a.n_cols, n_shards))
