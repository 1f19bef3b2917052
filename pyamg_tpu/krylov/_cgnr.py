"""CGNR — CG on the normal equations A^H A x = A^H b.

Rebuild of [R] pyamg/krylov/_cgnr.py (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np

from ._cgne import _adjoint
from ._common import norm, setup_system

__all__ = ["cgnr"]


def cgnr(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
         callback=None, residuals=None):
    """Conjugate gradient on the normal equations (residual-minimizing)."""
    AH = _adjoint(A)
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

    z = AH @ (M @ r if M is not None else r)
    p = z.copy()
    zz = np.inner(z.conj(), z)

    it = 0
    while True:
        Ap = A @ p
        App = np.inner(Ap.conj(), Ap)
        if App == 0:
            return (x, it if it > 0 else -1)
        alpha = zz / App
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
        z = AH @ (M @ r if M is not None else r)
        zz_new = np.inner(z.conj(), z)
        beta = zz_new / zz
        zz = zz_new
        p = z + beta * p
