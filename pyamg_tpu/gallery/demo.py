"""Quick-start demo.

Rebuild of [R] pyamg/gallery/demo.py::demo (SURVEY.md §1 layer L7).
"""

from __future__ import annotations

import numpy as np

__all__ = ["demo"]


def demo():
    """Solve a 2D Poisson problem with smoothed aggregation + CG."""
    from ..aggregation import smoothed_aggregation_solver
    from .laplacian import poisson

    n = 100
    A = poisson((n, n), format="csr")
    b = np.random.default_rng(0).random(A.shape[0])
    ml = smoothed_aggregation_solver(A)
    print(ml)
    residuals = []
    x = ml.solve(b, tol=1e-10, accel="cg", residuals=residuals)
    print(f"residual after {len(residuals) - 1} iterations: "
          f"{residuals[-1] / residuals[0]:.2e}")
    return x
