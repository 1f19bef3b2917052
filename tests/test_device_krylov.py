"""Device Krylov family parity vs host histories (VERDICT r3 item 5).

The device methods run the ENTIRE preconditioned iteration as one XLA
program; with order-free (Jacobi) smoothers the f64 device V-cycle
matches the host cycle to rounding, so residual HISTORIES must agree
with the host Krylov implementations to orthogonalization/rounding noise
(SURVEY.md §4 idiom 4: Krylov cross-validation).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pyamg_tpu
from pyamg_tpu.engine import as_device_solver
from pyamg_tpu.gallery import (diffusion_stencil_2d, poisson, recirc_flow,
                               stencil_grid)

_J = ("jacobi", {"omega": 4.0 / 3.0})


@pytest.fixture(scope="module")
def spd_pair():
    """Poisson SA hierarchy with order-free smoothing (host + device)."""
    A = poisson((32, 32), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(
        A, presmoother=_J, postsmoother=_J, max_coarse=16)
    dml = as_device_solver(ml, dtype=jnp.float64)
    b = np.random.default_rng(0).random(A.shape[0])
    return A, ml, dml, b


@pytest.fixture(scope="module")
def nonsym_pair():
    """config5-class operator (recirculating advection-diffusion) with a
    classical RS hierarchy, order-free smoothing."""
    A = recirc_flow((48, 48), epsilon=1e-2).tocsr()
    ml = pyamg_tpu.ruge_stuben_solver(
        A, presmoother=_J, postsmoother=_J, max_coarse=16)
    dml = as_device_solver(ml, dtype=jnp.float64)
    b = np.random.default_rng(1).random(A.shape[0])
    return A, ml, dml, b


def _history_parity(ml, dml, b, accel, maxiter=30, tol=1e-8, rtol=1e-6,
                    **dkw):
    res_h, res_d = [], []
    ml.solve(b, tol=tol, maxiter=maxiter, accel=accel, residuals=res_h)
    x = dml.solve(b, tol=tol, maxiter=maxiter, accel=accel,
                  residuals=res_d, **dkw)
    m = min(len(res_h), len(res_d))
    assert m >= 3, (accel, len(res_h), len(res_d))
    np.testing.assert_allclose(res_d[:m], res_h[:m], rtol=rtol,
                               err_msg=f"accel={accel}")
    return x, res_d


def test_device_gmres_matches_host_history():
    """Device GMRES (left-preconditioned, CGS2) == host gmres_mgs
    histories on the config3 operator class (rotated anisotropic
    diffusion + classical RS)."""
    S = diffusion_stencil_2d(epsilon=1e-3, theta=np.pi / 4, type="FD")
    A = stencil_grid(S, (64, 64)).tocsr()
    ml = pyamg_tpu.ruge_stuben_solver(
        A, presmoother=_J, postsmoother=_J, max_coarse=16)
    dml = as_device_solver(ml, dtype=jnp.float64)
    b = np.random.default_rng(2).random(A.shape[0])
    # host gmres(restrt=None) = one cycle of maxiter inner steps; match
    # with restart=maxiter on device
    x, res = _history_parity(ml, dml, b, "gmres", maxiter=60, restart=60)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-5


def test_device_gmres_restarted():
    """Restarted device GMRES still converges (outer while_loop) and the
    history stays monotone within cycles."""
    S = diffusion_stencil_2d(epsilon=1e-3, theta=np.pi / 4, type="FD")
    A = stencil_grid(S, (64, 64)).tocsr()
    ml = pyamg_tpu.ruge_stuben_solver(
        A, presmoother=_J, postsmoother=_J, max_coarse=16)
    dml = as_device_solver(ml, dtype=jnp.float64)
    b = np.random.default_rng(3).random(A.shape[0])
    res = []
    x = dml.solve(b, tol=1e-8, maxiter=40, accel="gmres", restart=5,
                  residuals=res)
    # restarts cost convergence speed on this weak hierarchy — the point
    # here is the outer while_loop machinery: multiple cycles ran and the
    # (preconditioned) residual kept dropping across restart boundaries
    assert len(res) > 10
    assert res[-1] / res[0] < 1e-3


def test_device_cgnr_matches_host_history(nonsym_pair):
    """Device CGNR == host cgnr histories on the config5 operator class
    (nonsymmetric recirculating flow).  CGNR squares the conditioning —
    convergence is slow on BOTH paths by construction; the contract
    pinned here is exact history parity (measured 2.6e-16 max relative
    difference) plus monotone decrease, matching reference behavior."""
    A, ml, dml, b = nonsym_pair
    x, res = _history_parity(ml, dml, b, "cgnr", maxiter=60, tol=1e-6,
                             rtol=1e-10)
    assert res[-1] < res[0]


def test_device_cgne_matches_host_history(nonsym_pair):
    """Exact history parity.  (On this operator CGNE with a V-cycle-of-A
    preconditioner diverges — on the HOST identically: the method wants
    M ~ (A A^H)^-1.  Faithful reference behavior, so parity, not
    convergence, is the contract.)"""
    A, ml, dml, b = nonsym_pair
    _history_parity(ml, dml, b, "cgne", maxiter=40, tol=1e-4, rtol=1e-8)


def test_device_cr_matches_host_history(spd_pair):
    A, ml, dml, b = spd_pair
    x, res = _history_parity(ml, dml, b, "cr", maxiter=30)
    assert res[-1] / res[0] < 1e-7


def test_device_minimal_residual_matches_host_history(spd_pair):
    A, ml, dml, b = spd_pair
    _history_parity(ml, dml, b, "minimal_residual", maxiter=30, tol=1e-6)


def test_device_steepest_descent_matches_host_history(spd_pair):
    A, ml, dml, b = spd_pair
    _history_parity(ml, dml, b, "steepest_descent", maxiter=30, tol=1e-6)


@pytest.mark.parametrize("accel", ["cr", "minimal_residual",
                                   "steepest_descent", "gmres"])
def test_device_accel_converges(spd_pair, accel):
    """Every routed accelerator reaches the requested tolerance on SPD
    Poisson with the V-cycle preconditioner (cgnr/cgne square the
    conditioning and are pinned by history parity above instead)."""
    A, ml, dml, b = spd_pair
    res = []
    x = dml.solve(b, tol=1e-8, maxiter=60, accel=accel, residuals=res,
                  restart=20)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-6, accel


def test_device_gmres_batched():
    """Batched multi-RHS device GMRES: per-lane freeze + matmat reroute
    (each lane must match its own single-RHS solve)."""
    A = poisson((24, 24), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(
        A, presmoother=_J, postsmoother=_J, max_coarse=16)
    dml = as_device_solver(ml, dtype=jnp.float64)
    K = 3
    B = np.random.default_rng(5).random((A.shape[0], K))
    Xb = dml.solve(B, tol=1e-8, maxiter=24, accel="gmres", restart=6)
    for j in range(K):
        xj = dml.solve(B[:, j], tol=1e-8, maxiter=24, accel="gmres",
                       restart=6)
        np.testing.assert_allclose(Xb[:, j], xj, rtol=1e-8, atol=1e-10)


def test_cimmino_nr_equivalence_nonsymmetric():
    """The gauss_seidel_nr -> Cimmino (Jacobi-NR) device substitution is
    CONVERGENCE-equivalent on the config5 operator class: the device
    hierarchy's FGMRES solve converges at a comparable rate to the host
    hierarchy's true sequential Kaczmarz sweeps (SURVEY.md §7 hard part 3
    acceptance: factor parity, not bitwise parity — pins the bench's
    UserWarning as a tested equivalence, VERDICT r3 item 5)."""
    import warnings as _w

    A = recirc_flow((48, 48), epsilon=1e-2).tocsr()
    ml = pyamg_tpu.smoothed_aggregation_solver(
        A, symmetry="nonsymmetric", strength="symmetric",
        presmoother=("gauss_seidel_nr", {"sweep": "symmetric",
                                         "iterations": 2}),
        postsmoother=("gauss_seidel_nr", {"sweep": "symmetric",
                                          "iterations": 2}),
        max_coarse=16)
    b = np.random.default_rng(7).random(A.shape[0])
    res_h = []
    ml.solve(b, tol=1e-8, maxiter=60, accel="fgmres", residuals=res_h)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        dml = as_device_solver(ml, dtype=jnp.float64, row_pad=8)
    assert any("gauss_seidel_nr" in str(w.message) for w in rec)
    res_d = []
    x = dml.solve(b, tol=1e-8, maxiter=60, accel="fgmres", residuals=res_d)
    assert np.linalg.norm(b - A @ x) / np.linalg.norm(b) < 1e-6

    def fac(r):
        return (r[-1] / r[0]) ** (1.0 / (len(r) - 1))

    fh, fd = fac(res_h), fac(res_d)
    # Cimmino at the same row-update budget (the x2 symmetric-sweep work
    # parity in engine/hierarchy.py) smooths more weakly than sequential
    # Kaczmarz — measured 0.54 vs 0.26 here — but the Krylov-wrapped
    # solve stays in the same convergence class and reaches tol; pin the
    # measured envelope so a regression (e.g. the substitution silently
    # becoming plain Jacobi) trips this test
    assert fd < max(2.4 * fh, 0.62), (fd, fh)
