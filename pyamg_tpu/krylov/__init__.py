"""Krylov accelerators (host reference implementations).

Rebuild of [R] pyamg/krylov/ (SURVEY.md §2.3, layer L5).  Uniform
scipy-style signature ``(A, b, x0, tol, criteria, maxiter, M, callback,
residuals) -> (x, info)``.  Device (lax.while_loop) analogs live in
:mod:`pyamg_tpu.engine.krylov`.
"""

from ._bicgstab import bicgstab
from ._cg import cg
from ._cgne import cgne
from ._cgnr import cgnr
from ._cr import cr
from ._fgmres import fgmres
from ._gmres import gmres
from ._gmres_householder import gmres_householder
from ._gmres_mgs import gmres_mgs
from ._minimal_residual import minimal_residual
from ._steepest_descent import steepest_descent

__all__ = [
    "bicgstab",
    "cg",
    "cgne",
    "cgnr",
    "cr",
    "fgmres",
    "gmres",
    "gmres_householder",
    "gmres_mgs",
    "minimal_residual",
    "steepest_descent",
]
