"""Flexible GMRES (right-preconditioned, varying preconditioner allowed).

Rebuild of [R] pyamg/krylov/_fgmres.py (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["fgmres"]


def fgmres(A, b, x0=None, tol=1e-5, criteria="rr", restrt=None, maxiter=None,
           M=None, callback=None, residuals=None):
    """FGMRES(restrt): right preconditioning with Z_j = M r_j stored per
    column, so M may change between iterations (e.g. a V-cycle with
    iterative coarse solves).  Residual history holds true residual norms.
    """
    A, M, x, b, dtype, maxiter_in = setup_system(A, b, x0, maxiter, M)
    n = b.shape[0]

    if restrt is not None:
        max_inner = min(int(restrt), n)
        max_outer = int(maxiter) if maxiter is not None else 1
    else:
        max_inner = min(maxiter_in, n)
        max_outer = 1

    r = b - A @ x
    normr = norm(r)
    normb = norm(b)
    rtol = tol * (normb if normb != 0 else 1.0)
    if criteria == "rr+":
        rtol = tol * (normb + normr)
    if rtol == 0:
        rtol = tol
    if residuals is not None:
        residuals.append(normr)
    if normr < rtol:
        return (x, 0)

    it = 0
    for _outer in range(max_outer):
        r = b - A @ x
        beta = norm(r)
        if beta == 0:
            return (x, 0)
        V = np.zeros((max_inner + 1, n), dtype=dtype)
        Z = np.zeros((max_inner, n), dtype=dtype)
        H = np.zeros((max_inner + 1, max_inner), dtype=dtype)
        cs = np.zeros(max_inner, dtype=dtype)
        sn = np.zeros(max_inner, dtype=dtype)
        g = np.zeros(max_inner + 1, dtype=dtype)
        g[0] = beta
        V[0] = r / beta
        j_used = 0
        for j in range(max_inner):
            Z[j] = M @ V[j] if M is not None else V[j]
            w = A @ Z[j]
            for i in range(j + 1):
                H[i, j] = np.inner(V[i].conj(), w)
                w = w - H[i, j] * V[i]
            wnorm = norm(w)
            H[j + 1, j] = wnorm
            for i in range(j):
                t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
                H[i + 1, j] = -np.conj(sn[i]) * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = t
            denom = np.sqrt(np.abs(H[j, j]) ** 2 + np.abs(H[j + 1, j]) ** 2)
            if denom == 0:
                j_used = j
                break
            if H[j, j] != 0:
                ph = H[j, j] / np.abs(H[j, j])
                cs[j] = np.abs(H[j, j]) / denom
                sn[j] = ph * np.conj(H[j + 1, j]) / denom
            else:
                cs[j] = 0.0
                sn[j] = 1.0
            H[j, j] = cs[j] * H[j, j] + sn[j] * H[j + 1, j]
            H[j + 1, j] = 0.0
            g[j + 1] = -np.conj(sn[j]) * g[j]
            g[j] = cs[j] * g[j]
            it += 1
            j_used = j + 1
            normr = np.abs(g[j + 1])
            if residuals is not None:
                residuals.append(normr)
            if normr < rtol:
                break
            if restrt is None and it >= maxiter_in:
                break
            if wnorm == 0:
                break
            V[j + 1] = w / wnorm
        if j_used > 0:
            y = np.linalg.solve(
                H[:j_used, :j_used] + 1e-300 * np.eye(j_used, dtype=dtype),
                g[:j_used],
            )
            x = x + Z[:j_used].T @ y
        if callback is not None:
            callback(x)
        if normr < rtol:
            return (x, 0)
        if restrt is None:
            break
    return (x, it)
