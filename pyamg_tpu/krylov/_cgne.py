"""CGNE — CG on the normal equations A A^H y = b, x = A^H y.

Rebuild of [R] pyamg/krylov/_cgne.py (SURVEY.md §2.3).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import LinearOperator

from ._common import make_operator, norm, setup_system

__all__ = ["cgne"]


def _adjoint(A):
    if sp.issparse(A):
        return make_operator(A.conjugate().T)
    Aop = make_operator(A)
    return LinearOperator(
        (Aop.shape[1], Aop.shape[0]),
        matvec=lambda v: Aop.rmatvec(v),
        dtype=Aop.dtype,
    )


def cgne(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
         callback=None, residuals=None):
    """Conjugate gradient on the normal equations (error-minimizing form)."""
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

    z = M @ r if M is not None else r
    p = AH @ z
    rz = np.inner(r.conj(), z)

    it = 0
    while True:
        pp = np.inner(p.conj(), p)
        if pp == 0:
            return (x, it if it > 0 else -1)
        alpha = rz / pp
        x += alpha * p
        r -= alpha * (A @ p)
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
        z = M @ r if M is not None else r
        rz_new = np.inner(r.conj(), z)
        beta = rz_new / rz
        rz = rz_new
        p = AH @ z + beta * p
