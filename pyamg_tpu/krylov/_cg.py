"""Preconditioned conjugate gradient.

Rebuild of [R] pyamg/krylov/_cg.py::cg (SURVEY.md §2.3).  The device
analog (lax.while_loop form) lives in pyamg_tpu.engine.krylov.
"""

from __future__ import annotations

import numpy as np

from ._common import norm, setup_system

__all__ = ["cg"]


def cg(A, b, x0=None, tol=1e-5, criteria="rr", maxiter=None, M=None,
       callback=None, residuals=None):
    """Conjugate gradient for SPD A (optionally M-preconditioned).

    Returns (x, info); info = 0 on convergence, iteration count otherwise.
    ``residuals`` (if a list) receives the 2-norm of the true residual at
    every iteration including iteration 0 — the reference's residual
    history contract (BASELINE.json:5).
    """
    A, M, x, b, dtype, maxiter = setup_system(A, b, x0, maxiter, M)

    r = b - A @ x
    z = M @ r if M is not None else r.copy()
    p = z.copy()
    rz = np.inner(r.conj(), z)

    # the monitored quantity depends on the stopping criteria
    # ([R] pyamg/krylov/_cg.py): 'rr'/'rr+' watch ||r||; 'rMr' the
    # preconditioner energy norm sqrt(<r, Mr>); 'MrMr' ||Mr||
    def monitored(r, z, rz):
        if criteria == "rMr":
            return float(np.sqrt(abs(rz)))
        if criteria == "MrMr":
            return norm(z)
        return norm(r)

    normr = monitored(r, z, rz)
    if residuals is not None:
        residuals.append(normr)

    normb = norm(b)
    if criteria == "rr":
        rtol = tol * (normb if normb != 0 else 1.0)
    elif criteria == "rr+":
        rtol = tol * (normb + normr)
    elif criteria == "rMr":
        Mb = M @ b if M is not None else b
        rtol = tol * np.sqrt(abs(np.inner(b.conj(), Mb)))
    elif criteria == "MrMr":
        Mb = M @ b if M is not None else b
        rtol = tol * norm(Mb)
    else:
        raise ValueError(f"invalid stopping criteria: {criteria}")
    if rtol == 0:
        rtol = tol

    if normr < rtol:
        return (x, 0)

    it = 0
    while True:
        Ap = A @ p
        pAp = np.inner(p.conj(), Ap)
        if pAp == 0:
            return (x, it if it > 0 else -1)
        alpha = rz / pAp
        x += alpha * p
        r -= alpha * Ap
        it += 1
        if criteria in ("rr", "rr+"):
            # avoid a final (possibly expensive) preconditioner apply
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
        else:
            z = M @ r if M is not None else r
            rz_new = np.inner(r.conj(), z)
            normr = monitored(r, z, rz_new)
            if residuals is not None:
                residuals.append(normr)
            if callback is not None:
                callback(x)
            if normr < rtol:
                return (x, 0)
            if it >= maxiter:
                return (x, it)
        beta = rz_new / rz
        rz = rz_new
        p = z + beta * p
