"""Degenerate-input robustness: tiny, singular, diagonal, disconnected."""

import warnings

import numpy as np
import pytest
import scipy.sparse as sp

import pyamg_tpu
from pyamg_tpu.gallery import poisson


@pytest.mark.parametrize("grid", [(2,), (2, 2), (3, 3), (1, 5)])
def test_tiny_grids(grid):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        A = poisson(grid, format="csr")
        ml = pyamg_tpu.smoothed_aggregation_solver(A)
    b = np.ones(A.shape[0])
    x = ml.solve(b, tol=1e-10)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-10


def test_one_by_one():
    A = sp.csr_matrix(np.array([[2.0]]))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ml = pyamg_tpu.smoothed_aggregation_solver(A)
    np.testing.assert_allclose(ml.solve(np.array([4.0]), tol=1e-12), [2.0])


def test_singular_semidefinite():
    """Zero-row-sum SPSD operator (Neumann-like): solve in range(A)."""
    A = poisson((6, 6)).tolil()
    d = np.asarray(A.sum(axis=1)).ravel()
    for i in range(A.shape[0]):
        A[i, i] -= d[i]
    A = A.tocsr()
    b = np.random.default_rng(0).random(A.shape[0])
    b -= b.mean()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ml = pyamg_tpu.smoothed_aggregation_solver(A)
    x = ml.solve(b, tol=1e-8, maxiter=100)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-7


def test_diagonal_matrix():
    A = sp.diags(np.arange(1.0, 101.0)).tocsr()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ml = pyamg_tpu.ruge_stuben_solver(A)
    b = np.ones(100)
    x = ml.solve(b, tol=1e-12)
    np.testing.assert_allclose(x * np.arange(1.0, 101.0), 1.0, atol=1e-12)


def test_disconnected_components():
    A = sp.block_diag([poisson((6, 6)), poisson((4, 4))]).tocsr()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ml = pyamg_tpu.smoothed_aggregation_solver(A)
    b = np.ones(A.shape[0])
    x = ml.solve(b, tol=1e-8)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-7
