"""Restarted GMRES with Householder orthogonalization.

Rebuild of [R] pyamg/krylov/_gmres_householder.py (SURVEY.md §2.3).
Host analog of amg_core krylov.h::apply_householders /
householder_hornerscheme (SURVEY.md §2.4): the Krylov basis is built by
Householder reflectors (numerically more robust than MGS for severely
ill-conditioned bases), least-squares via Givens rotations.
"""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["gmres_householder"]


def _reflector(z, j):
    """Householder u (unit) zeroing z[j+1:], leaving z[:j] untouched."""
    n = z.shape[0]
    u = np.zeros_like(z)
    u[j:] = z[j:]
    sigma = norm(u)
    if sigma == 0:
        return u, False
    zj = z[j]
    phase = zj / np.abs(zj) if zj != 0 else 1.0
    u[j] += phase * sigma
    nu = norm(u)
    if nu == 0:
        return np.zeros_like(z), False
    return u / nu, True


def _apply(u, v):
    """v <- (I - 2 u u^H) v."""
    return v - 2.0 * u * np.inner(u.conj(), v)


def gmres_householder(A, b, x0=None, tol=1e-5, criteria="rr", restrt=None,
                      maxiter=None, M=None, callback=None, residuals=None):
    """GMRES(restrt) with Householder reflectors.  Returns (x, info)."""
    A, M, x, b, dtype, maxiter_in = setup_system(A, b, x0, maxiter, M)
    n = b.shape[0]

    if restrt is not None:
        max_inner = min(int(restrt), n)
        max_outer = int(maxiter) if maxiter is not None else 1
    else:
        max_inner = min(maxiter_in, n)
        max_outer = 1

    r = b - A @ x
    z0 = M @ r if M is not None else r
    normr = norm(z0)
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
        z = (M @ r if M is not None else r).astype(dtype, copy=True)
        U = np.zeros((max_inner + 1, n), dtype=dtype)
        V = np.zeros((max_inner, n), dtype=dtype)
        H = np.zeros((max_inner + 1, max_inner), dtype=dtype)
        cs = np.zeros(max_inner, dtype=dtype)
        sn = np.zeros(max_inner, dtype=dtype)
        g = np.zeros(max_inner + 1, dtype=dtype)
        j_used = 0
        for j in range(max_inner + 1):
            u, ok = _reflector(z, j)
            U[j] = u
            Pz = _apply(u, z) if ok else z
            if j == 0:
                g[0] = Pz[0]
            else:
                H[: j + 1, j - 1] = Pz[: j + 1]
                col = j - 1
                # existing rotations
                for i in range(col):
                    t = cs[i] * H[i, col] + sn[i] * H[i + 1, col]
                    H[i + 1, col] = -np.conj(sn[i]) * H[i, col] + cs[i] * H[i + 1, col]
                    H[i, col] = t
                denom = np.sqrt(
                    np.abs(H[col, col]) ** 2 + np.abs(H[col + 1, col]) ** 2
                )
                if denom != 0:
                    if H[col, col] != 0:
                        ph = H[col, col] / np.abs(H[col, col])
                        cs[col] = np.abs(H[col, col]) / denom
                        sn[col] = ph * np.conj(H[col + 1, col]) / denom
                    else:
                        cs[col] = 0.0
                        sn[col] = 1.0
                    H[col, col] = cs[col] * H[col, col] + sn[col] * H[col + 1, col]
                    H[col + 1, col] = 0.0
                    g[col + 1] = -np.conj(sn[col]) * g[col]
                    g[col] = cs[col] * g[col]
                it += 1
                j_used = j
                normr = np.abs(g[col + 1])
                if residuals is not None:
                    residuals.append(normr)
                if normr < rtol:
                    break
                if restrt is None and it >= maxiter_in:
                    break
            if j == max_inner:
                break
            # v = P_0 ... P_j e_j
            v = np.zeros(n, dtype=dtype)
            v[j] = 1.0
            for i in range(j, -1, -1):
                v = _apply(U[i], v)
            V[j] = v
            w = A @ v
            w = M @ w if M is not None else w
            z = w.astype(dtype, copy=True)
            for i in range(j + 1):
                z = _apply(U[i], z)
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
