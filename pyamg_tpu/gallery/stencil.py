"""Stencil-to-sparse-matrix engine.

Rebuild of [R] pyamg/gallery/stencil.py::stencil_grid (SURVEY.md §2.3) —
the engine under poisson/diffusion.  Fully vectorized: one COO block per
stencil offset, zero (Dirichlet) boundary entries dropped.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["stencil_grid"]


def stencil_grid(S, grid, dtype=None, format=None):
    """Construct a sparse matrix from a local stencil on a regular grid.

    Parameters
    ----------
    S : ndarray
        Stencil of odd shape, e.g. (3,), (3, 3), (3, 3, 3); the center
        entry couples a node to itself, offsets index neighbors.
        Connections reaching outside the grid are dropped (homogeneous
        Dirichlet).
    grid : tuple of ints
        Grid dimensions, e.g. (100, 100).

    Returns
    -------
    sparse matrix, shape (prod(grid), prod(grid)) in ``format`` (default CSR).
    """
    S = np.asarray(S, dtype=dtype)
    grid = tuple(int(g) for g in grid)
    if S.ndim != len(grid):
        raise ValueError("stencil dimension must equal number of grid dimensions")
    if min(grid) < 1:
        raise ValueError("grid dimensions must be positive")
    if any(s % 2 == 0 for s in S.shape):
        raise ValueError("all stencil dimensions must be odd")

    n = int(np.prod(grid))
    center = tuple(s // 2 for s in S.shape)
    strides = np.array(
        [int(np.prod(grid[d + 1:])) for d in range(len(grid))], dtype=np.int64
    )
    grid_arr = np.array(grid, dtype=np.int64)

    # coordinates of every node, shape (n, ndim)
    coords = np.stack(
        np.meshgrid(*[np.arange(g) for g in grid], indexing="ij"), axis=-1
    ).reshape(n, len(grid))

    rows_list, cols_list, vals_list = [], [], []
    for offset in np.ndindex(S.shape):
        v = S[offset]
        if v == 0:
            continue
        off = np.array(offset, dtype=np.int64) - np.array(center, dtype=np.int64)
        nbr = coords + off[None, :]
        ok = np.all((nbr >= 0) & (nbr < grid_arr[None, :]), axis=1)
        rows = np.flatnonzero(ok)
        cols = nbr[ok] @ strides
        rows_list.append(rows)
        cols_list.append(cols)
        vals_list.append(np.full(rows.shape[0], v, dtype=S.dtype))

    rows = np.concatenate(rows_list) if rows_list else np.array([], dtype=np.int64)
    cols = np.concatenate(cols_list) if cols_list else np.array([], dtype=np.int64)
    vals = np.concatenate(vals_list) if vals_list else np.array([], dtype=S.dtype)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    if format in (None, "csr"):
        return A
    return A.asformat(format)
