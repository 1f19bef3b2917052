"""Minimal P1 finite-element module.

Rebuild of [R] pyamg/gallery/fem.py (SURVEY.md §2.3, (M) confidence):
``gradgradform`` assembles the P1 stiffness matrix for -div(kappa grad u)
on a triangle mesh; ``refine_mesh`` performs uniform refinement.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["gradgradform", "refine_mesh"]


def gradgradform(vertices, elements, kappa=None):
    """Assemble the P1 stiffness matrix int kappa grad(u).grad(v)."""
    V = np.asarray(vertices, dtype=float)
    E = np.asarray(elements, dtype=np.int64)
    n = V.shape[0]
    ne = E.shape[0]

    p0, p1, p2 = V[E[:, 0]], V[E[:, 1]], V[E[:, 2]]
    d1 = p1 - p0
    d2 = p2 - p0
    detJ = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    area = 0.5 * np.abs(detJ)

    grads = np.empty((ne, 3, 2))
    inv_det = 1.0 / detJ
    grads[:, 1, 0] = d2[:, 1] * inv_det
    grads[:, 1, 1] = -d2[:, 0] * inv_det
    grads[:, 2, 0] = -d1[:, 1] * inv_det
    grads[:, 2, 1] = d1[:, 0] * inv_det
    grads[:, 0, :] = -(grads[:, 1, :] + grads[:, 2, :])

    if kappa is None:
        k = np.ones(ne)
    elif callable(kappa):
        centers = (p0 + p1 + p2) / 3.0
        k = np.asarray([kappa(c) for c in centers], dtype=float)
    else:
        k = np.full(ne, float(kappa))

    Ke = np.einsum("eid,ejd,e,e->eij", grads, grads, area, k)  # (ne, 3, 3)
    rows = np.repeat(E, 3, axis=1).ravel()
    cols = np.tile(E, (1, 3)).ravel()
    A = sp.coo_matrix((Ke.ravel(), (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A


def refine_mesh(vertices, elements):
    """Uniform (red) refinement: each triangle -> 4 triangles."""
    V = np.asarray(vertices, dtype=float)
    E = np.asarray(elements, dtype=np.int64)
    edges = np.vstack([E[:, [0, 1]], E[:, [1, 2]], E[:, [2, 0]]])
    edges_sorted = np.sort(edges, axis=1)
    uniq, inverse = np.unique(edges_sorted, axis=0, return_inverse=True)
    midpoints = 0.5 * (V[uniq[:, 0]] + V[uniq[:, 1]])
    Vnew = np.vstack([V, midpoints])
    ne = E.shape[0]
    m01 = V.shape[0] + inverse[:ne]
    m12 = V.shape[0] + inverse[ne: 2 * ne]
    m20 = V.shape[0] + inverse[2 * ne:]
    Enew = np.vstack([
        np.stack([E[:, 0], m01, m20], axis=1),
        np.stack([E[:, 1], m12, m01], axis=1),
        np.stack([E[:, 2], m20, m12], axis=1),
        np.stack([m01, m12, m20], axis=1),
    ])
    return Vnew, Enew
