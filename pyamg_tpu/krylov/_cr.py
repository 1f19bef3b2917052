"""Conjugate residual.  Rebuild of [R] pyamg/krylov/_cr.py (SURVEY.md §2.3)."""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["cr"]


def cr(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
       callback=None, residuals=None):
    """Conjugate residual method for Hermitian (possibly indefinite) A."""
    A, M, x, b, dtype, maxiter = setup_system(A, b, x0, maxiter, M)

    r = b - A @ x
    z = M @ r if M is not None else r.copy()
    p = z.copy()
    Az = A @ z
    Ap = Az.copy()
    rAz = np.inner(r.conj() if M is None else z.conj(), Az)

    normr = norm(r)
    if residuals is not None:
        residuals.append(normr)
    normb = norm(b)
    rtol = tol * (normb if normb != 0 else 1.0)
    if criteria == "rr+":
        rtol = tol * (normb + normr)
    if rtol == 0:
        rtol = tol
    if normr < rtol:
        return (x, 0)

    it = 0
    while True:
        MAp = M @ Ap if M is not None else Ap
        ApAp = np.inner(Ap.conj(), MAp)
        if ApAp == 0:
            return (x, it if it > 0 else -1)
        alpha = rAz / ApAp
        x += alpha * p
        r -= alpha * Ap
        z = M @ r if M is not None else r
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
        Az = A @ z
        rAz_new = np.inner(z.conj(), Az)
        beta = rAz_new / rAz
        rAz = rAz_new
        p = z + beta * p
        Ap = Az + beta * Ap
