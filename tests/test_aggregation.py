"""Aggregation + SA end-to-end convergence (SURVEY.md §4 idiom 2)."""

import numpy as np
import scipy.sparse as sp

from pyamg_tpu.aggregation import (
    fit_candidates,
    lloyd_aggregation,
    naive_aggregation,
    pairwise_aggregation,
    smoothed_aggregation_solver,
    standard_aggregation,
)
from pyamg_tpu.gallery import linear_elasticity, poisson
from pyamg_tpu.strength import symmetric_strength_of_connection


def avg_convergence_factor(residuals):
    residuals = np.asarray(residuals)
    if residuals[0] == 0 or len(residuals) < 2:
        return 0.0
    return (residuals[-1] / residuals[0]) ** (1.0 / (len(residuals) - 1))


def test_standard_aggregation_partition():
    A = poisson((10, 10)).tocsr()
    C = symmetric_strength_of_connection(A)
    AggOp, Cpts = standard_aggregation(C)
    # every node in exactly one aggregate (Poisson graph is connected)
    rowsums = np.asarray(AggOp.sum(axis=1)).ravel()
    assert (rowsums == 1).all()
    assert AggOp.shape == (100, len(Cpts))
    # roots belong to their own aggregate
    assignment = AggOp.indices[AggOp.indptr[:-1]]
    for a, r in enumerate(Cpts):
        assert assignment[r] == a


def test_naive_and_lloyd_aggregation():
    A = poisson((12, 12)).tocsr()
    C = symmetric_strength_of_connection(A)
    for fn in (naive_aggregation, lloyd_aggregation):
        AggOp, Cpts = fn(C)
        rowsums = np.asarray(AggOp.sum(axis=1)).ravel()
        assert (rowsums == 1).all(), fn.__name__
        assert 1 < AggOp.shape[1] < AggOp.shape[0]


def test_pairwise_aggregation():
    A = poisson((12, 12)).tocsr()
    AggOp, Cpts = pairwise_aggregation(A, matchings=2)
    rowsums = np.asarray(AggOp.sum(axis=1)).ravel()
    assert (rowsums == 1).all()
    # two matchings -> aggregates of size <= 4, coarsening ratio ~4
    assert AggOp.shape[1] <= 144 // 2


def test_fit_candidates_ones():
    A = poisson((8, 8)).tocsr()
    C = symmetric_strength_of_connection(A)
    AggOp, _ = standard_aggregation(C)
    B = np.ones((64, 1))
    T, Bc = fit_candidates(AggOp, B)
    # T reproduces B on the coarse grid: T @ Bc == B
    np.testing.assert_allclose((T @ Bc).ravel(), B.ravel(), atol=1e-12)
    # orthonormal columns
    G = (T.T @ T).toarray()
    np.testing.assert_allclose(G, np.eye(T.shape[1]), atol=1e-12)


def test_fit_candidates_multiple():
    rng = np.random.default_rng(0)
    n_nodes, n_agg = 30, 6
    assignment = rng.integers(0, n_agg, n_nodes)
    AggOp = sp.csr_matrix(
        (np.ones(n_nodes), (np.arange(n_nodes), assignment)),
        shape=(n_nodes, n_agg),
    )
    B = rng.standard_normal((n_nodes, 2))
    T, Bc = fit_candidates(AggOp, B)
    np.testing.assert_allclose((T @ Bc), B, atol=1e-10)
    # orthonormal up to rank deficiency: diagonal entries are 0 (dropped
    # dependent candidate in a tiny aggregate) or 1, off-diagonals ~0
    G = (T.T @ T).toarray()
    d = np.diag(G).copy()
    assert np.all((np.abs(d) < 1e-10) | (np.abs(d - 1) < 1e-10))
    np.testing.assert_allclose(G - np.diag(d), 0, atol=1e-10)


def test_sa_poisson_2d_convergence():
    """BASELINE config-1 shape: SA V-cycle + CG on 2D Poisson."""
    A = poisson((50, 50), format="csr")
    ml = smoothed_aggregation_solver(A, max_coarse=10)
    rng = np.random.default_rng(1)
    b = rng.random(A.shape[0])
    residuals = []
    x = ml.solve(b, tol=1e-10, maxiter=60, residuals=residuals)
    factor = avg_convergence_factor(residuals)
    assert residuals[-1] / residuals[0] < 1e-9
    assert factor < 0.25, f"SA V-cycle factor {factor} too slow"
    assert ml.operator_complexity() < 1.6


def test_sa_poisson_cg_accel():
    A = poisson((50, 50), format="csr")
    ml = smoothed_aggregation_solver(A, max_coarse=10)
    b = np.random.default_rng(2).random(A.shape[0])
    residuals = []
    x = ml.solve(b, tol=1e-10, accel="cg", residuals=residuals)
    assert residuals[-1] / residuals[0] < 1e-9
    assert len(residuals) < 25  # ~10-20 iterations expected
    np.testing.assert_allclose(A @ x, b, atol=1e-6)


def test_sa_poisson_3d():
    A = poisson((12, 12, 12), format="csr")
    ml = smoothed_aggregation_solver(A, max_coarse=12)
    b = np.random.default_rng(3).random(A.shape[0])
    residuals = []
    ml.solve(b, tol=1e-8, maxiter=60, residuals=residuals)
    assert avg_convergence_factor(residuals) < 0.35


def test_sa_elasticity_with_rbms():
    A, B = linear_elasticity((10, 10))
    ml = smoothed_aggregation_solver(A, B=B, max_coarse=10)
    b = np.random.default_rng(4).random(A.shape[0])
    residuals = []
    ml.solve(b, tol=1e-8, maxiter=80, accel="cg", residuals=residuals)
    assert residuals[-1] / residuals[0] < 1e-7
    factor = avg_convergence_factor(residuals)
    assert factor < 0.5, f"SA elasticity factor {factor}"


def test_sa_nonsymmetric_mode():
    A = poisson((20, 20), format="csr")
    ml = smoothed_aggregation_solver(A, symmetry="nonsymmetric",
                                     max_coarse=10)
    b = np.random.default_rng(5).random(A.shape[0])
    residuals = []
    ml.solve(b, tol=1e-8, maxiter=60, residuals=residuals)
    assert residuals[-1] / residuals[0] < 1e-7


def test_sa_keep_operators():
    A = poisson((15, 15), format="csr")
    ml = smoothed_aggregation_solver(A, keep=True)
    lvl = ml.levels[0]
    for attr in ("C", "AggOp", "T", "Cpts"):
        assert hasattr(lvl, attr)
    # Galerkin: A1 == R A0 P
    A1 = ml.levels[1].A
    RAP = sp.csr_matrix(lvl.R @ (sp.csr_matrix(lvl.A) @ lvl.P))
    diff = abs(sp.csr_matrix(A1) - RAP)
    assert diff.max() < 1e-12 * abs(A1).max()
