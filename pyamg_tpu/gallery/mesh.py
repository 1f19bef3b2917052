"""Simple structured meshes.

Rebuild of [R] pyamg/gallery/mesh.py::regular_triangle_mesh (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

__all__ = ["regular_triangle_mesh"]


def regular_triangle_mesh(nx, ny):
    """Triangulated regular grid on the unit square.

    Returns (vertices (n, 2) float, elements (ne, 3) int).
    """
    nx, ny = int(nx), int(ny)
    if nx < 2 or ny < 2:
        raise ValueError("minimum mesh dimension is 2: %s" % ((nx, ny),))
    x = np.linspace(0.0, 1.0, nx)
    y = np.linspace(0.0, 1.0, ny)
    X, Y = np.meshgrid(x, y, indexing="xy")
    vertices = np.stack([X.ravel(), Y.ravel()], axis=1)

    node = np.arange(nx * ny).reshape(ny, nx)
    n00 = node[:-1, :-1].ravel()
    n10 = node[:-1, 1:].ravel()
    n01 = node[1:, :-1].ravel()
    n11 = node[1:, 1:].ravel()
    lower = np.stack([n00, n10, n01], axis=1)
    upper = np.stack([n10, n11, n01], axis=1)
    elements = np.vstack([lower, upper]).astype(np.int64)
    return vertices, elements
