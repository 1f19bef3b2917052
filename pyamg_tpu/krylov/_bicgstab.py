"""BiCGStab.  Rebuild of [R] pyamg/krylov/_bicgstab.py (SURVEY.md §2.3)."""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["bicgstab"]


def bicgstab(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
             callback=None, residuals=None):
    """Stabilized bi-conjugate gradient for general square A.

    Returns (x, info); residual history contract as in :func:`cg`.
    """
    A, M, x, b, dtype, maxiter = setup_system(A, b, x0, maxiter, M)

    r = b - A @ x
    normr = norm(r)
    if residuals is not None:
        residuals.append(normr)
    normb = norm(b)
    if criteria == "rr":
        rtol = tol * (normb if normb != 0 else 1.0)
    elif criteria == "rr+":
        rtol = tol * (normb + normr)
    else:
        raise ValueError(f"invalid stopping criteria: {criteria}")
    if rtol == 0:
        rtol = tol
    if normr < rtol:
        return (x, 0)

    rstar = r.copy()
    p = r.copy()
    rrstar = np.inner(rstar.conj(), r)

    it = 0
    while True:
        Mp = M @ p if M is not None else p
        AMp = A @ Mp
        denom = np.inner(rstar.conj(), AMp)
        if denom == 0:
            return (x, it if it > 0 else -1)
        alpha = rrstar / denom
        s = r - alpha * AMp
        if norm(s) < rtol:
            x += alpha * Mp
            it += 1
            if residuals is not None:
                residuals.append(norm(b - A @ x))
            if callback is not None:
                callback(x)
            return (x, 0)
        Ms = M @ s if M is not None else s
        AMs = A @ Ms
        denom2 = np.inner(AMs.conj(), AMs)
        if denom2 == 0:
            return (x, it if it > 0 else -1)
        omega = np.inner(AMs.conj(), s) / denom2
        x += alpha * Mp + omega * Ms
        r = s - omega * AMs
        it += 1
        normr = norm(r)
        if residuals is not None:
            residuals.append(normr)
        if callback is not None:
            callback(x)
        if normr < rtol:
            return (x, 0)
        if it >= maxiter:
            return (x, it)
        rrstar_new = np.inner(rstar.conj(), r)
        if rrstar == 0 or omega == 0:
            return (x, it)
        beta = (rrstar_new / rrstar) * (alpha / omega)
        rrstar = rrstar_new
        p = r + beta * (p - omega * AMp)
