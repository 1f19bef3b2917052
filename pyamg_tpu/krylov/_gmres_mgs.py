"""Restarted GMRES with modified Gram-Schmidt orthogonalization.

Rebuild of [R] pyamg/krylov/_gmres_mgs.py (SURVEY.md §2.3).  Left
preconditioning; the residual history holds the Givens-rotation estimate
of the preconditioned residual norm per inner iteration (reference
convention).  Givens application is the host analog of amg_core
krylov.h::apply_givens (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["gmres_mgs"]


def gmres_mgs(A, b, x0=None, tol=1e-5, criteria="rr", restrt=None,
              maxiter=None, M=None, callback=None, residuals=None,
              reorth=False):
    """GMRES(restrt) with MGS.  Returns (x, info).

    If ``restrt`` is None a single cycle of up to ``maxiter`` inner
    iterations is run; otherwise ``maxiter`` outer restarts of ``restrt``
    inner iterations each.
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
    z = M @ r if M is not None else r
    normr = norm(z)
    normb = norm(b)
    if criteria == "rr":
        ref = norm(M @ b if M is not None else b)
        rtol = tol * (ref if ref != 0 else 1.0)
    elif criteria == "rr+":
        rtol = tol * (normb + normr)
    else:
        raise ValueError(f"invalid stopping criteria: {criteria}")
    if rtol == 0:
        rtol = tol
    if residuals is not None:
        residuals.append(normr)
    if normr < rtol:
        return (x, 0)

    it = 0
    for _outer in range(max_outer):
        r = b - A @ x
        z = M @ r if M is not None else r
        beta = norm(z)
        if beta == 0:
            return (x, 0)
        V = np.zeros((max_inner + 1, n), dtype=dtype)
        H = np.zeros((max_inner + 1, max_inner), dtype=dtype)
        cs = np.zeros(max_inner, dtype=dtype)
        sn = np.zeros(max_inner, dtype=dtype)
        g = np.zeros(max_inner + 1, dtype=dtype)
        g[0] = beta
        V[0] = z / beta
        j_used = 0
        broke = False
        for j in range(max_inner):
            w = A @ V[j]
            w = M @ w if M is not None else w
            # modified Gram-Schmidt
            for i in range(j + 1):
                H[i, j] = np.inner(V[i].conj(), w)
                w = w - H[i, j] * V[i]
            if reorth:
                for i in range(j + 1):
                    c = np.inner(V[i].conj(), w)
                    H[i, j] += c
                    w = w - c * V[i]
            H[j + 1, j] = norm(w)
            # apply existing Givens rotations to the new column
            for i in range(j):
                t = cs[i] * H[i, j] + sn[i] * H[i + 1, j]
                H[i + 1, j] = -np.conj(sn[i]) * H[i, j] + cs[i] * H[i + 1, j]
                H[i, j] = t
            # new rotation to eliminate H[j+1, j]
            denom = np.sqrt(np.abs(H[j, j]) ** 2 + np.abs(H[j + 1, j]) ** 2)
            if denom == 0:
                j_used = j
                broke = True
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
            if normr < rtol or it >= maxiter_in and restrt is None:
                broke = True
                break
            if V.shape[0] > j + 1 and norm(w) != 0:
                V[j + 1] = w / norm(w)
            else:
                broke = True
                break
        # solve the triangular system and update x
        if j_used > 0:
            y = np.linalg.solve(
                H[:j_used, :j_used] + 1e-300 * np.eye(j_used, dtype=dtype),
                g[:j_used],
            )
            x = x + V[:j_used].T @ y
        if callback is not None:
            callback(x)
        if normr < rtol:
            return (x, 0)
        if restrt is None:
            break
    return (x, it)
