"""Relaxation methods ([R] pyamg/relaxation/, SURVEY.md §2.3)."""

from . import relaxation
from .chebyshev import chebyshev_polynomial_coefficients, mls_polynomial_coefficients
from .smoothing import change_smoothers

__all__ = [
    "relaxation",
    "chebyshev_polynomial_coefficients",
    "mls_polynomial_coefficients",
    "change_smoothers",
]
