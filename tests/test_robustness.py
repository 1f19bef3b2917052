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


def test_int_and_list_inputs():
    """b as a python list / int array; x0 as int zeros — the reference
    accepts anything array-like."""
    import pyamg_tpu
    from pyamg_tpu.gallery import poisson

    A = poisson((16, 16), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(A)
    b_list = list(range(A.shape[0]))
    x = ml.solve(b_list, tol=1e-8, accel="cg", maxiter=60)
    r = np.linalg.norm(np.asarray(b_list) - A @ x)
    assert r / np.linalg.norm(b_list) < 1e-7
    x2 = ml.solve(np.asarray(b_list, dtype=np.int64),
                  x0=np.zeros(A.shape[0], dtype=np.int32),
                  tol=1e-8, accel="cg", maxiter=60)
    assert np.allclose(x, x2, atol=1e-6)


def test_zero_rhs():
    import pyamg_tpu
    from pyamg_tpu.gallery import poisson

    A = poisson((16, 16), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(A)
    res = []
    x = ml.solve(np.zeros(A.shape[0]), tol=1e-8, residuals=res)
    assert np.allclose(x, 0)


def test_nonfinite_rhs_raises_or_flags():
    """NaN in b must not silently return garbage: either an exception
    or a non-converged info flag / NaN result the caller can detect."""
    import pyamg_tpu
    from pyamg_tpu.gallery import poisson

    A = poisson((16, 16), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(A)
    b = np.ones(A.shape[0])
    b[3] = np.nan
    try:
        x = ml.solve(b, tol=1e-8, maxiter=10, accel="cg")
    except (ValueError, FloatingPointError):
        return
    assert not np.isfinite(x).all()


def test_device_tiny_and_singular():
    """Device engine on tiny grids and a singular semidefinite operator
    (padded rows + pinv coarse solve must stay clean)."""
    import jax.numpy as jnp
    import pyamg_tpu
    import scipy.sparse as sp
    from pyamg_tpu.engine import as_device_solver
    from pyamg_tpu.gallery import poisson

    A = poisson((5, 7), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(A, max_coarse=5)
    dml = as_device_solver(ml)
    b = np.random.default_rng(0).random(A.shape[0])
    x = dml.solve(b, tol=1e-5, maxiter=40, accel="cg")
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-4

    # pure Neumann (singular, semidefinite): solve the projected system
    n = 24
    e = np.ones(n)
    An = sp.diags([-e[:-1], 2 * e, -e[:-1]], [-1, 0, 1], format="csr")
    An = An.tolil()
    An[0, 0] = 1.0
    An[0, 1] = -1.0
    An[-1, -1] = 1.0
    An[-1, -2] = -1.0
    An = An.tocsr()
    mln = pyamg_tpu.smoothed_aggregation_solver(An, max_coarse=4)
    dmn = as_device_solver(mln)
    bn = np.random.default_rng(1).random(n)
    bn -= bn.mean()                      # in range(A)
    xn = dmn.solve(bn, tol=1e-4, maxiter=80, accel="cg")
    rn = np.linalg.norm(bn - An @ xn) / np.linalg.norm(bn)
    assert rn < 1e-2, rn
