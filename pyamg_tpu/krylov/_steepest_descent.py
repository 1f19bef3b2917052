"""Steepest descent for SPD systems.

Rebuild of [R] pyamg/krylov/_steepest_descent.py (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["steepest_descent"]


def steepest_descent(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None,
                     M=None, callback=None, residuals=None):
    """Energy-minimizing update per iteration:
    x <- x + alpha z with z = M r, alpha = <r, z>/<z, Az>."""
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
        z = M @ r if M is not None else r
        Az = A @ z
        denom = np.inner(z.conj(), Az)
        if denom == 0:
            return (x, it if it > 0 else -1)
        alpha = np.inner(r.conj(), z) / denom
        x += alpha * z
        r -= alpha * Az
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
