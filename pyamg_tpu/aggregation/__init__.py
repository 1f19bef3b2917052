"""Aggregation-based AMG methods ([R] pyamg/aggregation/, SURVEY.md §2.2)."""

from .aggregate import (
    balanced_lloyd_aggregation,
    lloyd_aggregation,
    naive_aggregation,
    pairwise_aggregation,
    standard_aggregation,
)
from .adaptive import adaptive_sa_solver
from .aggregation import smoothed_aggregation_solver
from .pairwise import pairwise_solver
from .rootnode import rootnode_solver
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
    "adaptive_sa_solver",
    "pairwise_solver",
    "rootnode_solver",
    "smoothed_aggregation_solver",
    "energy_prolongation_smoother",
    "jacobi_prolongation_smoother",
    "richardson_prolongation_smoother",
    "fit_candidates",
]
