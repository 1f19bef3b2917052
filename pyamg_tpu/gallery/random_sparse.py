"""Random sparse matrix generator.

Rebuild of [R] pyamg/gallery/random_sparse.py::sprand (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

__all__ = ["sprand"]


def sprand(m, n, density, format="csr", dtype=float, seed=None):
    """Random sparse matrix with uniformly distributed values in [0, 1)."""
    m, n = int(m), int(n)
    rng = np.random.default_rng(seed)
    nnz = max(min(int(m * n * density), m * n), 0)
    row = rng.integers(0, m, size=nnz)
    col = rng.integers(0, n, size=nnz)
    data = rng.random(nnz).astype(dtype)
    A = sp.coo_matrix((data, (row, col)), shape=(m, n))
    A.sum_duplicates()
    return A.asformat(format)
