"""Poisson / gauge-Laplacian problem generators.

Rebuild of [R] pyamg/gallery/laplacian.py (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from .stencil import stencil_grid

__all__ = ["poisson", "gauge_laplacian"]


def poisson(grid, dtype=float, format=None, type="FD"):
    """Finite-difference/element Poisson problem on a regular grid.

    1D: [-1, 2, -1]; 2D FD: 5-point; 2D FE: 9-point; 3D FD: 7-point;
    3D FE: 27-point.  Homogeneous Dirichlet boundaries.
    """
    grid = tuple(int(g) for g in grid)
    ndim = len(grid)
    if min(grid) < 1:
        raise ValueError("invalid grid shape")
    if type not in ("FD", "FE"):
        raise ValueError("type must be 'FD' or 'FE'")

    if type == "FD" and ndim in (1, 2, 3):
        # separable FD Laplacian: Kronecker-sum assembly (fast path; the
        # generic stencil_grid path below produces the identical matrix)
        import scipy.sparse as sp

        def lap1d(m):
            return sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(m, m),
                            format="csr", dtype=dtype)

        eyes = [sp.identity(g, format="csr", dtype=dtype) for g in grid]
        A = None
        for d in range(ndim):
            ops = [eyes[j] if j != d else lap1d(grid[d]) for j in range(ndim)]
            term = ops[0]
            for op in ops[1:]:
                term = sp.kron(term, op, format="csr")
            A = term if A is None else A + term
        A = A.tocsr()
        A.sum_duplicates()
        A.sort_indices()
        if format not in (None, "csr"):
            A = A.asformat(format)
        return A

    if ndim == 1:
        S = np.array([-1.0, 2.0, -1.0], dtype=dtype)
    elif ndim == 2:
        if type == "FD":
            S = np.array(
                [[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=dtype
            )
        else:
            S = np.array(
                [[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]], dtype=dtype
            ) / 3.0
    elif ndim == 3:
        if type == "FD":
            S = np.zeros((3, 3, 3), dtype=dtype)
            S[1, 1, 1] = 6
            S[0, 1, 1] = S[2, 1, 1] = -1
            S[1, 0, 1] = S[1, 2, 1] = -1
            S[1, 1, 0] = S[1, 1, 2] = -1
        else:
            # 27-point FE Laplacian
            S = -np.ones((3, 3, 3), dtype=dtype)
            S[1, 1, 1] = 26.0
            S /= 3.0
    else:
        raise ValueError("only 1D/2D/3D Poisson supported")
    return stencil_grid(S, grid, dtype=dtype, format=format)


def gauge_laplacian(npts, spacing=1.0, beta=0.1, seed=0):
    """2D periodic U(1) gauge Laplacian (complex Hermitian).

    Rebuild of [R] pyamg/gallery/laplacian.py::gauge_laplacian: the QCD
    test operator A = G - shifts with random gauge phases
    exp(i 2 pi beta * N(0,1)) on each link; A is Hermitian positive
    semi-definite for small beta.
    """
    import scipy.sparse as sp

    n = int(npts)
    N = n * n
    rng = np.random.default_rng(seed)

    def phase():
        return np.exp(1j * 2.0 * np.pi * beta * rng.standard_normal(N))

    idx = np.arange(N).reshape(n, n)
    right = np.roll(idx, -1, axis=1).ravel()
    up = np.roll(idx, -1, axis=0).ravel()
    rows = np.arange(N)
    px = phase()
    py = phase()
    data = []
    I = []
    J = []
    # -x link and its conjugate
    I.extend([rows, right, rows, up])
    J.extend([right, rows, up, rows])
    data.extend([-px, -np.conj(px), -py, -np.conj(py)])
    I = np.concatenate(I)
    J = np.concatenate(J)
    data = np.concatenate(data)
    A = sp.coo_matrix((data, (I, J)), shape=(N, N)).tocsr()
    A = A + sp.identity(N, dtype=complex, format="csr") * 4.0
    A = A / spacing ** 2
    return A.tocsr()
