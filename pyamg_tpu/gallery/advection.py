"""Advection / recirculating-flow generators (nonsymmetric test problems).

Rebuild of [R] pyamg/gallery/advection.py (SURVEY.md §2.3).  These are
the AIR / nonsymmetric-AMG test matrices (BASELINE.json:11).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["advection_2d", "recirc_flow"]


def advection_2d(grid, theta=np.pi / 4.0, l_bdry=1.0, b_bdry=1.0):
    """First-order upwind FD for (cos t, sin t) . grad(u) on a regular grid.

    Rebuild of [R] pyamg/gallery/advection.py::advection_2d.  Inflow
    boundary values (left and bottom edges for theta in (0, pi/2)) move to
    the right-hand side.  Returns (A, rhs) with A CSR (n*m, n*m),
    nonsymmetric — the AIR solver's canonical test matrix.
    """
    ny, nx = int(grid[0]), int(grid[1])
    n = nx * ny
    c = np.cos(theta)
    s = np.sin(theta)
    if c < 0 or s < 0:
        raise ValueError("theta must lie in [0, pi/2]")
    hx = 1.0 / nx
    hy = 1.0 / ny

    idx = np.arange(n).reshape(ny, nx)
    rows, cols, vals = [], [], []
    rhs = np.zeros(n)

    # diagonal: c/hx + s/hy
    rows.append(idx.ravel())
    cols.append(idx.ravel())
    vals.append(np.full(n, c / hx + s / hy))

    # left neighbor (x-upwind): -c/hx
    has_left = idx[:, 1:]
    left = idx[:, :-1]
    rows.append(has_left.ravel())
    cols.append(left.ravel())
    vals.append(np.full(has_left.size, -c / hx))
    # left-boundary inflow -> rhs
    rhs[idx[:, 0]] += (c / hx) * l_bdry

    # bottom neighbor (y-upwind): -s/hy   (row 0 is the bottom boundary row)
    has_down = idx[1:, :]
    down = idx[:-1, :]
    rows.append(has_down.ravel())
    cols.append(down.ravel())
    vals.append(np.full(has_down.size, -s / hy))
    rhs[idx[0, :]] += (s / hy) * b_bdry

    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()
    return A, rhs


def recirc_flow(grid, epsilon=1e-2, format=None):
    """Recirculating advection-diffusion: -eps*lap(u) + b . grad(u).

    Rebuild of the reference's ``recirc_flow`` example dataset
    ([R] pyamg/gallery/example.py::load_example('recirc_flow'), SURVEY.md
    §2.3) as a *generator* (the shipped .mat datasets are unavailable in
    this build): rotational velocity field b = (4y(x-0.5)(x-1)... ) —
    here the standard rotating field b = 2*pi*(y-0.5, -(x-0.5)) on the
    unit square, first-order upwind FD + centered diffusion, Dirichlet
    boundaries.  Nonsymmetric; the BASELINE.json:11 config's operator.
    """
    ny, nx = int(grid[0]), int(grid[1])
    n = nx * ny
    h = 1.0 / (nx + 1)
    x = (np.arange(nx) + 1) * (1.0 / (nx + 1))
    y = (np.arange(ny) + 1) * (1.0 / (ny + 1))
    X, Y = np.meshgrid(x, y, indexing="xy")  # shape (ny, nx)
    bx = 2.0 * np.pi * (Y - 0.5)
    by = -2.0 * np.pi * (X - 0.5)

    idx = np.arange(n).reshape(ny, nx)
    rows, cols, vals = [], [], []

    diag = np.full((ny, nx), 4.0 * epsilon / h ** 2)

    def add(rsel, csel, v):
        rows.append(rsel.ravel())
        cols.append(csel.ravel())
        vals.append(v.ravel())

    # diffusion off-diagonals
    add(idx[:, 1:], idx[:, :-1], np.full((ny, nx - 1), -epsilon / h ** 2))
    add(idx[:, :-1], idx[:, 1:], np.full((ny, nx - 1), -epsilon / h ** 2))
    add(idx[1:, :], idx[:-1, :], np.full((ny - 1, nx), -epsilon / h ** 2))
    add(idx[:-1, :], idx[1:, :], np.full((ny - 1, nx), -epsilon / h ** 2))

    # upwind advection in x: bx >= 0 uses left neighbor, bx < 0 right
    pos = bx >= 0
    diag += np.abs(bx) / h
    # left neighbor coupling where bx>=0 (skip first column: Dirichlet 0)
    m = pos[:, 1:]
    add(idx[:, 1:][m], idx[:, :-1][m], (-bx[:, 1:][m]) / h)
    m = (~pos)[:, :-1]
    add(idx[:, :-1][m], idx[:, 1:][m], bx[:, :-1][m] / h)

    # upwind advection in y
    posy = by >= 0
    diag += np.abs(by) / h
    m = posy[1:, :]
    add(idx[1:, :][m], idx[:-1, :][m], (-by[1:, :][m]) / h)
    m = (~posy)[:-1, :]
    add(idx[:-1, :][m], idx[1:, :][m], (by[:-1, :][m]) / h)

    add(idx, idx, diag)
    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(n, n),
    ).tocsr()
    if format is not None:
        A = A.asformat(format)
    return A
