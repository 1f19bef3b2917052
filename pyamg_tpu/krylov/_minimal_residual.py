"""Minimal residual iteration.

Rebuild of [R] pyamg/krylov/_minimal_residual.py (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["minimal_residual"]


def minimal_residual(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None,
                     M=None, callback=None, residuals=None):
    """One-dimensional residual-minimizing update per iteration:
    x <- x + alpha p with p = M r and alpha = <Ap, r>/<Ap, Ap>."""
    A, M, x, b, dtype, maxiter = setup_system(A, b, x0, maxiter, M)

    r = b - A @ x
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
        p = M @ r if M is not None else r
        Ap = A @ p
        denom = np.inner(Ap.conj(), Ap)
        if denom == 0:
            return (x, it if it > 0 else -1)
        alpha = np.inner(Ap.conj(), r) / denom
        x += alpha * p
        r -= alpha * Ap
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
