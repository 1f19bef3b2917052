"""Krylov methods vs direct solves (SURVEY.md §4 idiom 4)."""

import numpy as np
import pytest
import scipy.sparse as sp

from pyamg_tpu import krylov
from pyamg_tpu.gallery import poisson


def spd_system(n=100, seed=0):
    A = poisson((10, n // 10)).tocsr()
    rng = np.random.default_rng(seed)
    b = rng.random(A.shape[0])
    x_exact = sp.linalg.spsolve(A.tocsc(), b)
    return A, b, x_exact


def nonsym_system(seed=1):
    rng = np.random.default_rng(seed)
    n = 60
    A = sp.csr_matrix(np.eye(n) * 4 + 0.5 * rng.standard_normal((n, n)) / np.sqrt(n))
    b = rng.random(n)
    x_exact = np.linalg.solve(A.toarray(), b)
    return A, b, x_exact


@pytest.mark.parametrize("method", ["cg", "cr", "steepest_descent",
                                    "minimal_residual"])
def test_spd_methods(method):
    A, b, x_exact = spd_system()
    fn = getattr(krylov, method)
    residuals = []
    x, info = fn(A, b, tol=1e-10, maxiter=2000, residuals=residuals)
    assert info == 0
    np.testing.assert_allclose(x, x_exact, atol=1e-6)
    assert residuals[0] > residuals[-1]
    assert residuals[-1] < 1e-10 * np.linalg.norm(b) * 10


@pytest.mark.parametrize("method", ["gmres", "gmres_mgs", "gmres_householder",
                                    "fgmres", "bicgstab", "cgne", "cgnr"])
def test_general_methods(method):
    A, b, x_exact = nonsym_system()
    fn = getattr(krylov, method)
    residuals = []
    x, info = fn(A, b, tol=1e-10, maxiter=200, residuals=residuals)
    assert info == 0, f"{method} failed to converge"
    np.testing.assert_allclose(x, x_exact, atol=1e-5)


def test_gmres_variants_agree():
    A, b, _ = nonsym_system()
    x1, _ = krylov.gmres_mgs(A, b, tol=1e-12, maxiter=60)
    x2, _ = krylov.gmres_householder(A, b, tol=1e-12, maxiter=60)
    np.testing.assert_allclose(x1, x2, atol=1e-7)


def test_gmres_restarted():
    A, b, x_exact = spd_system()
    x, info = krylov.gmres(A, b, restrt=20, maxiter=30, tol=1e-8,
                           orthog="mgs")
    np.testing.assert_allclose(x, x_exact, atol=1e-4)


def test_cg_with_preconditioner():
    A, b, x_exact = spd_system()
    from scipy.sparse.linalg import LinearOperator
    dinv = 1.0 / A.diagonal()
    M = LinearOperator(A.shape, matvec=lambda v: dinv * v)
    res_plain, res_prec = [], []
    krylov.cg(A, b, tol=1e-8, maxiter=1000, residuals=res_plain)
    x, info = krylov.cg(A, b, tol=1e-8, maxiter=1000, M=M, residuals=res_prec)
    assert info == 0
    np.testing.assert_allclose(x, x_exact, atol=1e-5)


def test_residual_history_starts_at_r0():
    A, b, _ = spd_system()
    residuals = []
    x0 = np.zeros(A.shape[0])
    krylov.cg(A, b, x0=x0, tol=1e-8, residuals=residuals)
    np.testing.assert_allclose(residuals[0], np.linalg.norm(b), rtol=1e-12)


def test_callback_invoked():
    A, b, _ = spd_system()
    count = []
    krylov.cg(A, b, tol=1e-8, callback=lambda xk: count.append(1))
    assert len(count) > 0


def test_complex_cg():
    n = 40
    rng = np.random.default_rng(3)
    Q = np.linalg.qr(rng.standard_normal((n, n))
                     + 1j * rng.standard_normal((n, n)))[0]
    A = sp.csr_matrix(Q @ np.diag(rng.random(n) + 1) @ Q.conj().T)
    b = rng.random(n) + 1j * rng.random(n)
    x, info = krylov.cg(A, b, tol=1e-10, maxiter=500)
    assert info == 0
    np.testing.assert_allclose(A @ x, b, atol=1e-7)


@pytest.mark.parametrize("criteria", ["rr", "rr+", "rMr", "MrMr"])
def test_cg_criteria(criteria):
    A, b, x_exact = spd_system()
    from scipy.sparse.linalg import LinearOperator
    dinv = 1.0 / A.diagonal()
    M = LinearOperator(A.shape, matvec=lambda v: dinv * v)
    res = []
    x, info = krylov.cg(A, b, tol=1e-10, maxiter=2000, M=M,
                        criteria=criteria, residuals=res)
    assert info == 0, criteria
    np.testing.assert_allclose(x, x_exact, atol=1e-5)
    assert res[0] > res[-1]
