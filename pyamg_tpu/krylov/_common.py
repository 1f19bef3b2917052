"""Shared plumbing for the Krylov methods.

Rebuild of the common signature pattern of [R] pyamg/krylov/_*.py
(SURVEY.md §2.3): ``(A, b, x0=None, tol=1e-5, criteria='rr',
maxiter=None, M=None, callback=None, residuals=None) -> (x, info)``.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
from scipy.sparse.linalg import LinearOperator, aslinearoperator

from ..util.linalg import norm
from ..util.utils import upcast

__all__ = ["setup_system", "make_operator", "norm", "upcast"]


def make_operator(A):
    if A is None:
        return None
    if isinstance(A, LinearOperator):
        return A
    if sp.issparse(A):
        return aslinearoperator(A)
    if hasattr(A, "matvec"):
        return A
    return aslinearoperator(np.asarray(A))


def setup_system(A, b, x0, maxiter, M):
    """Canonicalize operands; returns (A, M, x, b, postprocess_dtype, maxiter)."""
    Aop = make_operator(A)
    n = Aop.shape[0]
    b = np.asarray(b).ravel()
    if b.shape[0] != n:
        raise ValueError("b has incompatible dimension")
    dtype = upcast(getattr(A, "dtype", b.dtype), b.dtype,
                   x0.dtype if x0 is not None and hasattr(x0, "dtype") else b.dtype)
    b = b.astype(dtype, copy=False)
    if x0 is None:
        x = np.zeros(n, dtype=dtype)
    elif isinstance(x0, str) and x0 == "random":
        x = np.random.default_rng(0).random(n).astype(dtype)
    else:
        x = np.asarray(x0, dtype=dtype).ravel().copy()
        if x.shape[0] != n:
            raise ValueError("x0 has incompatible dimension")
    Mop = make_operator(M)
    if maxiter is None:
        maxiter = n
    return Aop, Mop, x, b, dtype, int(maxiter)
