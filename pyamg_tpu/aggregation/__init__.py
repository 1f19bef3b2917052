"""Aggregation-based AMG methods ([R] pyamg/aggregation/, SURVEY.md §2.2)."""

from .aggregate import (
    balanced_lloyd_aggregation,
    lloyd_aggregation,
    naive_aggregation,
    pairwise_aggregation,
    standard_aggregation,
)
from .aggregation import smoothed_aggregation_solver
from .smooth import (
    energy_prolongation_smoother,
    jacobi_prolongation_smoother,
    richardson_prolongation_smoother,
)
from .tentative import fit_candidates

__all__ = [
    "balanced_lloyd_aggregation",
    "lloyd_aggregation",
    "naive_aggregation",
    "pairwise_aggregation",
    "standard_aggregation",
    "smoothed_aggregation_solver",
    "energy_prolongation_smoother",
    "jacobi_prolongation_smoother",
    "richardson_prolongation_smoother",
    "fit_candidates",
]
