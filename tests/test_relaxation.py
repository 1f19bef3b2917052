"""Relaxation: exact-semantics checks vs golden loop references."""

import numpy as np
import scipy.sparse as sp

from pyamg_tpu.gallery import poisson, linear_elasticity
from pyamg_tpu.relaxation import relaxation as rel
from pyamg_tpu.relaxation.chebyshev import chebyshev_polynomial_coefficients
from pyamg_tpu.util.linalg import approximate_spectral_radius


def reference_gauss_seidel(A, x, b, sweep="forward"):
    """Row-by-row dense loop GS."""
    Ad = A.toarray()
    n = len(x)
    order = range(n) if sweep == "forward" else range(n - 1, -1, -1)
    for i in order:
        rsum = Ad[i] @ x - Ad[i, i] * x[i]
        x[i] = (b[i] - rsum) / Ad[i, i]
    return x


def test_gauss_seidel_exact_semantics():
    A = poisson((6, 6)).tocsr()
    rng = np.random.default_rng(0)
    b = rng.random(A.shape[0])
    for sweep in ("forward", "backward"):
        x1 = rng.random(A.shape[0])
        x2 = x1.copy()
        rel.gauss_seidel(A, x1, b, iterations=2, sweep=sweep)
        for _ in range(2):
            reference_gauss_seidel(A, x2, b, sweep=sweep)
        np.testing.assert_allclose(x1, x2, atol=1e-12)


def test_gauss_seidel_symmetric_reduces_energy():
    A = poisson((10, 10)).tocsr()
    rng = np.random.default_rng(1)
    b = np.zeros(A.shape[0])
    x = rng.random(A.shape[0])
    e0 = x @ (A @ x)
    rel.gauss_seidel(A, x, b, iterations=3, sweep="symmetric")
    assert x @ (A @ x) < 0.5 * e0


def test_jacobi():
    A = poisson((8, 8)).tocsr()
    rng = np.random.default_rng(2)
    b = rng.random(A.shape[0])
    x = np.zeros(A.shape[0])
    x_ref = b / A.diagonal()  # one unweighted Jacobi step from zero
    rel.jacobi(A, x, b, iterations=1, omega=1.0)
    np.testing.assert_allclose(x, x_ref, atol=1e-14)
    # weighted jacobi converges on Poisson with omega ~ 2/3
    x = rng.random(A.shape[0])
    r0 = np.linalg.norm(b - A @ x)
    rel.jacobi(A, x, b, iterations=30, omega=2.0 / 3.0)
    assert np.linalg.norm(b - A @ x) < r0


def test_sor_matches_gs_at_omega1():
    A = poisson((5, 5)).tocsr()
    rng = np.random.default_rng(3)
    b = rng.random(A.shape[0])
    x1 = rng.random(A.shape[0])
    x2 = x1.copy()
    rel.sor(A, x1, b, omega=1.0, iterations=2)
    rel.gauss_seidel(A, x2, b, iterations=2)
    np.testing.assert_allclose(x1, x2, atol=1e-12)


def test_block_jacobi_matches_jacobi_bs1():
    A = poisson((6, 6)).tocsr()
    rng = np.random.default_rng(4)
    b = rng.random(A.shape[0])
    x1 = rng.random(A.shape[0])
    x2 = x1.copy()
    rel.block_jacobi(A, x1, b, blocksize=1, iterations=2, omega=0.7)
    rel.jacobi(A, x2, b, iterations=2, omega=0.7)
    np.testing.assert_allclose(x1, x2, atol=1e-12)


def test_block_methods_elasticity():
    A, B = linear_elasticity((5, 5))
    rng = np.random.default_rng(5)
    b = rng.random(A.shape[0])
    x = np.zeros(A.shape[0])
    r0 = np.linalg.norm(b)
    rel.block_jacobi(A, x, b, blocksize=2, iterations=20, omega=0.7)
    assert np.linalg.norm(b - A @ x) < r0
    x = np.zeros(A.shape[0])
    rel.block_gauss_seidel(A, x, b, blocksize=2, iterations=5)
    assert np.linalg.norm(b - A @ x) < 0.7 * r0


def test_polynomial_chebyshev():
    A = poisson((10, 10)).tocsr()
    rho = approximate_spectral_radius(A)
    coeffs = chebyshev_polynomial_coefficients(rho / 30.0, 1.1 * rho, 3)
    rng = np.random.default_rng(6)
    b = rng.random(A.shape[0])
    x = np.zeros(A.shape[0])
    r0 = np.linalg.norm(b)
    rel.polynomial(A, x, b, coefficients=coeffs, iterations=5)
    assert np.linalg.norm(b - A @ x) < 0.3 * r0


def test_ne_nr_variants():
    A = poisson((6, 6)).tocsr()
    rng = np.random.default_rng(7)
    b = rng.random(A.shape[0])
    for method, omega in ((rel.jacobi_ne, 0.25), (rel.gauss_seidel_ne, 1.0),
                          (rel.gauss_seidel_nr, 1.0)):
        x = np.zeros(A.shape[0])
        r0 = np.linalg.norm(b)
        method(A, x, b, iterations=10, omega=omega)
        assert np.linalg.norm(b - A @ x) < r0, method.__name__


def test_indexed_variants():
    A = poisson((6, 6)).tocsr()
    rng = np.random.default_rng(8)
    b = rng.random(A.shape[0])
    n = A.shape[0]
    idx = np.arange(n)
    x1 = rng.random(n)
    x2 = x1.copy()
    rel.gauss_seidel_indexed(A, x1, b, idx, iterations=1)
    rel.gauss_seidel(A, x2, b, iterations=1)
    np.testing.assert_allclose(x1, x2, atol=1e-12)
    x = np.zeros(n)
    rel.jacobi_indexed(A, x, b, idx[: n // 2], iterations=1)
    assert (x[n // 2:] == 0).all()


def test_cf_fc_jacobi():
    A = poisson((6, 6)).tocsr()
    n = A.shape[0]
    rng = np.random.default_rng(9)
    b = rng.random(n)
    Cpts = np.arange(0, n, 2)
    Fpts = np.arange(1, n, 2)
    for method in (rel.cf_jacobi, rel.fc_jacobi):
        x = np.zeros(n)
        r0 = np.linalg.norm(b)
        method(A, x, b, Cpts, Fpts, iterations=10, omega=0.7)
        assert np.linalg.norm(b - A @ x) < r0


def test_schwarz():
    A = poisson((6, 6)).tocsr()
    rng = np.random.default_rng(10)
    b = rng.random(A.shape[0])
    x = np.zeros(A.shape[0])
    r0 = np.linalg.norm(b)
    rel.schwarz(A, x, b, iterations=2)
    assert np.linalg.norm(b - A @ x) < 0.3 * r0
