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

    n_v = int(np.prod(grid))
    # stride of dimension d in the flattened row index
    strides = np.ones(dim, dtype=np.int64)
    for d in range(dim - 2, -1, -1):
        strides[d] = strides[d + 1] * grid[d + 1]

    # coordinates of every row, per dimension
    idx = np.arange(n_v, dtype=np.int64)
    coords = [(idx // strides[d]) % grid[d] for d in range(dim)]

    rows_list, cols_list, vals_list = [], [], []
    for flat, offs in enumerate(itertools.product((-1, 0, 1), repeat=dim)):
        # stencil value applied at offset `offs` is the entry at the
        # *reversed* position (stencil.cpp:171-180: value = data[N_s-d-1]).
        val = stencil[3 ** dim - 1 - flat]
        if abs(val) <= ZERO_TOL:
            continue
        mask = np.ones(n_v, dtype=bool)
        diag = 0
        for d, o in enumerate(offs):
            diag += int(o) * strides[d]
            if o == 1:
                mask &= coords[d] < grid[d] - 1
            elif o == -1:
                mask &= coords[d] > 0
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
    a = stencil_grid(stencil, grid, dim)
    return par_matrix_from_scipy(a.to_scipy(), n_shards)
