"""MultilevelSolver cycles, preconditioner wrapping, complexities."""

import numpy as np
import pytest
import scipy.sparse as sp

from pyamg_tpu import MultilevelSolver, coarse_grid_solver
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.gallery import poisson


@pytest.fixture(scope="module")
def ml_and_system():
    A = poisson((40, 40), format="csr")
    ml = smoothed_aggregation_solver(A, max_coarse=10)
    b = np.random.default_rng(0).random(A.shape[0])
    return ml, A, b


@pytest.mark.parametrize("cycle", ["V", "W", "F", "AMLI"])
def test_cycles_converge(ml_and_system, cycle):
    ml, A, b = ml_and_system
    residuals = []
    ml.solve(b, tol=1e-8, maxiter=60, cycle=cycle, residuals=residuals)
    assert residuals[-1] / residuals[0] < 1e-7, f"cycle {cycle}"
    # W/F cycles should not be slower per iteration than V
    factor = (residuals[-1] / residuals[0]) ** (1.0 / (len(residuals) - 1))
    assert factor < 0.3


def test_aspreconditioner_scipy_cg(ml_and_system):
    ml, A, b = ml_and_system
    from scipy.sparse.linalg import cg as scipy_cg

    M = ml.aspreconditioner()
    x, info = scipy_cg(A, b, M=M, rtol=1e-8)
    assert info == 0
    np.testing.assert_allclose(A @ x, b, atol=1e-5)


def test_complexities(ml_and_system):
    ml, A, b = ml_and_system
    assert 1.0 < ml.operator_complexity() < 2.0
    assert 1.0 < ml.grid_complexity() < 2.0
    assert ml.cycle_complexity("V") > 1.0
    assert ml.cycle_complexity("W") > ml.cycle_complexity("V")


def test_repr(ml_and_system):
    ml, A, b = ml_and_system
    out = repr(ml)
    assert "MultilevelSolver" in out
    assert "Operator Complexity" in out


def test_residuals_contract(ml_and_system):
    """residuals[0] == ||b - A x0||, appended every iteration."""
    ml, A, b = ml_and_system
    residuals = []
    ml.solve(b, x0=None, tol=1e-8, maxiter=10, residuals=residuals)
    np.testing.assert_allclose(residuals[0], np.linalg.norm(b), rtol=1e-12)
    assert len(residuals) >= 2


def test_coarse_grid_solvers():
    A = poisson((8, 8), format="csr")
    b = np.random.default_rng(1).random(A.shape[0])
    x_exact = sp.linalg.spsolve(A.tocsc(), b)
    for name in ("pinv", "lu", "splu", "cholesky"):
        cs = coarse_grid_solver(name)
        x = cs(A, b)
        np.testing.assert_allclose(x, x_exact, atol=1e-8), name
    cs = coarse_grid_solver(("gauss_seidel", {"iterations": 200}))
    x = cs(A, b)
    np.testing.assert_allclose(x, x_exact, atol=1e-2)


def test_accel_string_resolution(ml_and_system):
    ml, A, b = ml_and_system
    for accel in ("cg", "gmres", "bicgstab"):
        residuals = []
        x = ml.solve(b, tol=1e-8, accel=accel, residuals=residuals)
        assert residuals[-1] / residuals[0] < 1e-7, accel


def test_solve_with_x0(ml_and_system):
    ml, A, b = ml_and_system
    x_exact = sp.linalg.spsolve(A.tocsc(), b)
    x0 = x_exact + 1e-3 * np.random.default_rng(2).random(A.shape[0])
    residuals = []
    x = ml.solve(b, x0=x0, tol=1e-10, maxiter=30, residuals=residuals)
    assert residuals[0] < 1.0  # started close
    np.testing.assert_allclose(x, x_exact, atol=1e-7)


def test_matrix_formats():
    """SA accepts dense input with a warning, and BSR directly."""
    import warnings

    A = poisson((10, 10), format="csr")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ml = smoothed_aggregation_solver(A.toarray())
    b = np.ones(A.shape[0])
    x = ml.solve(b, tol=1e-8)
    np.testing.assert_allclose(A @ x, b, atol=1e-4)


def test_chebyshev_smoother_spec():
    """('chebyshev', {}) spec resolves host-side and on device."""
    import jax.numpy as jnp

    from pyamg_tpu.engine import as_device_solver

    A = poisson((24, 24), format="csr")
    ml = smoothed_aggregation_solver(
        A, presmoother=("chebyshev", {"degree": 3}),
        postsmoother=("chebyshev", {"degree": 3}), max_coarse=10)
    b = np.random.default_rng(7).random(A.shape[0])
    res = []
    ml.solve(b, tol=1e-8, maxiter=40, residuals=res)
    factor = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
    assert factor < 0.45, factor  # degree-3 Chebyshev: modest smoother
    dml = as_device_solver(ml, dtype=jnp.float64, row_pad=8)
    res_d = []
    x = dml.solve(b, tol=1e-8, maxiter=40, residuals=res_d)
    # chebyshev is order-free: device matches host to rounding
    np.testing.assert_allclose(res_d, res[: len(res_d)], rtol=1e-6)


def test_richardson_and_sor_specs():
    A = poisson((16, 16), format="csr")
    for pre in (("richardson", {"omega": 1.0}),
                ("sor", {"omega": 1.2, "sweep": "symmetric"})):
        ml = smoothed_aggregation_solver(A, presmoother=pre,
                                         postsmoother=pre, max_coarse=10)
        b = np.random.default_rng(8).random(A.shape[0])
        res = []
        ml.solve(b, tol=1e-8, maxiter=60, residuals=res)
        assert res[-1] / res[0] < 1e-7, pre


def test_jacobi_ne_device_spec():
    """Device NE smoother (ADVICE r1): jacobi_ne now gets a true device
    normal-equation form (Cimmino) instead of silently becoming plain
    Jacobi on A; histories match host exactly (order-free sweep)."""
    import warnings as _w

    import jax.numpy as jnp

    from pyamg_tpu.engine import as_device_solver

    A = poisson((16, 16), format="csr")
    ml = smoothed_aggregation_solver(
        A, presmoother=("jacobi_ne", {"omega": 1.0}),
        postsmoother=("jacobi_ne", {"omega": 1.0}), max_coarse=10)
    b = np.random.default_rng(3).random(A.shape[0])
    res = []
    ml.solve(b, tol=1e-8, maxiter=60, residuals=res)
    with _w.catch_warnings():
        _w.simplefilter("error")  # jacobi_ne must NOT warn-substitute
        dml = as_device_solver(ml, dtype=jnp.float64, row_pad=8)
    res_d = []
    dml.solve(b, tol=1e-8, maxiter=60, residuals=res_d)
    np.testing.assert_allclose(res_d, res[: len(res_d)], rtol=1e-6)


def test_gauss_seidel_ne_substitution_warns():
    """Kaczmarz (gauss_seidel_ne/nr) substitution is no longer silent."""
    import warnings as _w

    import jax.numpy as jnp

    from pyamg_tpu.engine import as_device_solver

    A = poisson((12, 12), format="csr")
    ml = smoothed_aggregation_solver(
        A, presmoother=("gauss_seidel_ne", {}),
        postsmoother=("gauss_seidel_nr", {}), max_coarse=10)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        dml = as_device_solver(ml, dtype=jnp.float64, row_pad=8)
    msgs = [str(w.message) for w in rec]
    assert any("gauss_seidel_ne" in m for m in msgs)
    assert any("gauss_seidel_nr" in m for m in msgs)
    b = np.ones(A.shape[0])
    res = []
    dml.solve(b, tol=1e-8, maxiter=80, residuals=res)
    # rho-scaled Cimmino is a weak but unconditionally convergent smoother
    assert res[-1] / res[0] < 1e-4


def test_schwarz_device_spec():
    """('schwarz', {}) resolves to the windowed overlapping Schwarz
    device form (round-1 verdict item 8: no more silent mcgs fallback)."""
    import warnings as _w

    import jax.numpy as jnp

    from pyamg_tpu.engine import as_device_solver

    A = poisson((20, 20), format="csr")
    ml = smoothed_aggregation_solver(
        A, presmoother=("schwarz", {}), postsmoother=("schwarz", {}),
        max_coarse=10)
    res_h = []
    ml.solve(np.ones(A.shape[0]), tol=1e-8, maxiter=60, residuals=res_h)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        dml = as_device_solver(ml, dtype=jnp.float64, row_pad=8)
    assert any("windowed overlapping Schwarz" in str(w.message)
               for w in rec)
    cfgs = {dml.hierarchy.levels[0].pre.config[0]}
    assert "win_schwarz" in cfgs
    res_d = []
    dml.solve(np.ones(A.shape[0]), tol=1e-8, maxiter=80, residuals=res_d)
    assert res_d[-1] / res_d[0] < 1e-7


def test_amli_depth_parameterized():
    """AMLI coarse-correction depth is a real parameter now, host and
    device, and depth 3 still converges."""
    import jax.numpy as jnp

    from pyamg_tpu.engine import as_device_solver

    A = poisson((24, 24), format="csr")
    ml = smoothed_aggregation_solver(
        A, presmoother=("jacobi", {"omega": 4.0 / 3.0}),
        postsmoother=("jacobi", {"omega": 4.0 / 3.0}), max_coarse=10)
    b = np.ones(A.shape[0])
    for depth in (1, 3):
        res = []
        ml.solve(b, tol=1e-8, maxiter=40, cycle="AMLI", residuals=res,
                 amli_depth=depth)
        assert res[-1] / res[0] < 1e-7, (depth, res[-1] / res[0])
        dml = as_device_solver(ml, dtype=jnp.float64, row_pad=8)
        res_d = []
        dml.solve(b, tol=1e-8, maxiter=40, cycle="AMLI", residuals=res_d,
                  amli_depth=depth)
        assert res_d[-1] / res_d[0] < 1e-7, depth
