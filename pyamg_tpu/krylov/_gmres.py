"""GMRES front end — dispatches to MGS or Householder orthogonalization.

Rebuild of [R] pyamg/krylov/_gmres.py::gmres (SURVEY.md §2.3).
"""

from __future__ import annotations

from ._gmres_householder import gmres_householder
from ._gmres_mgs import gmres_mgs

__all__ = ["gmres"]


def gmres(A, b, x0=None, tol=1e-5, criteria="rr", restrt=None, maxiter=None,
          M=None, callback=None, residuals=None, orthog="householder",
          restart=None, **kwargs):
    """Generalized minimal residual.  ``orthog`` selects 'householder'
    (reference default) or 'mgs'.  ``restart`` is accepted as an alias of
    ``restrt`` (scipy-style spelling)."""
    if restrt is None and restart is not None:
        restrt = restart
    if orthog == "householder":
        return gmres_householder(A, b, x0=x0, tol=tol, criteria=criteria,
                                 restrt=restrt, maxiter=maxiter, M=M,
                                 callback=callback, residuals=residuals)
    if orthog == "mgs":
        return gmres_mgs(A, b, x0=x0, tol=tol, criteria=criteria,
                         restrt=restrt, maxiter=maxiter, M=M,
                         callback=callback, residuals=residuals, **kwargs)
    raise ValueError(f"unknown orthogonalization '{orthog}'")
