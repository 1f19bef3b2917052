"""Classical RS AMG + splittings + interpolation (SURVEY.md §4 idioms 1-2)."""

import numpy as np
import pytest
import scipy.sparse as sp

from pyamg_tpu.classical import air_solver, ruge_stuben_solver
from pyamg_tpu.classical.interpolate import (
    classical_interpolation,
    direct_interpolation,
    distance_two_interpolation,
    injection_interpolation,
    local_air,
    one_point_interpolation,
)
from pyamg_tpu.classical.split import CLJP, CLJPc, PMIS, PMISc, RS, C_NODE, F_NODE
from pyamg_tpu.gallery import (
    advection_2d,
    diffusion_stencil_2d,
    poisson,
    stencil_grid,
)
from pyamg_tpu.strength import classical_strength_of_connection


def avg_factor(res):
    res = np.asarray(res)
    return (res[-1] / res[0]) ** (1.0 / (len(res) - 1))


@pytest.mark.parametrize("split_fn", [RS, PMIS, PMISc, CLJP, CLJPc])
def test_splittings_valid(split_fn):
    A = poisson((12, 12)).tocsr()
    S = classical_strength_of_connection(A, theta=0.25)
    splitting = split_fn(S)
    assert set(np.unique(splitting)).issubset({F_NODE, C_NODE})
    ncoarse = (splitting == C_NODE).sum()
    assert 0 < ncoarse < A.shape[0]
    # every F point has at least one strong C neighbor (RS guarantee)
    if split_fn is RS:
        Sp = S.copy()
        Sp.setdiag(0)
        Sp.eliminate_zeros()
        for i in np.flatnonzero(splitting == F_NODE):
            nbrs = Sp.indices[Sp.indptr[i]: Sp.indptr[i + 1]]
            assert (splitting[nbrs] == C_NODE).any(), f"F point {i} isolated"


def test_rs_second_pass():
    A = poisson((10, 10)).tocsr()
    S = classical_strength_of_connection(A, theta=0.25)
    s1 = RS(S, second_pass=False)
    s2 = RS(S, second_pass=True)
    # second pass can only add C points
    assert (s2[s1 == C_NODE] == C_NODE).all()


@pytest.mark.parametrize("interp", [direct_interpolation,
                                    classical_interpolation,
                                    distance_two_interpolation])
def test_interpolation_partition_of_unity(interp):
    """On Poisson (zero row sums in the interior), interpolation weights
    of interior F rows sum to ~1 (constant preservation)."""
    A = poisson((10, 10)).tocsr()
    S = classical_strength_of_connection(A, theta=0.25)
    splitting = RS(S)
    P = interp(A, S, splitting)
    assert P.shape == (100, (splitting == C_NODE).sum())
    rowsums = np.asarray(P.sum(axis=1)).ravel()
    # interior rows (full stencil) preserve constants
    interior = np.asarray((A != 0).sum(axis=1)).ravel() == 5
    np.testing.assert_allclose(rowsums[interior], 1.0, atol=1e-10)


def test_injection_one_point():
    A = poisson((8, 8)).tocsr()
    S = classical_strength_of_connection(A, theta=0.25)
    splitting = RS(S)
    nc = (splitting == C_NODE).sum()
    Pi = injection_interpolation(A, S, splitting)
    assert Pi.nnz == nc
    Po = one_point_interpolation(A, S, splitting)
    assert (Po.data == 1).all()
    assert Po.shape == (64, nc)


def test_rs_poisson_convergence():
    A = poisson((40, 40), format="csr")
    ml = ruge_stuben_solver(A)
    b = np.random.default_rng(0).random(A.shape[0])
    res = []
    ml.solve(b, tol=1e-10, maxiter=40, residuals=res)
    factor = avg_factor(res)
    assert res[-1] / res[0] < 1e-9
    assert factor < 0.2, f"RS factor {factor}"
    assert ml.operator_complexity() < 3.0


def test_rs_direct_interp():
    A = poisson((30, 30), format="csr")
    ml = ruge_stuben_solver(A, interpolation="direct")
    b = np.random.default_rng(1).random(A.shape[0])
    res = []
    ml.solve(b, tol=1e-8, maxiter=60, residuals=res)
    assert avg_factor(res) < 0.35


def test_rs_anisotropic_gmres():
    """BASELINE config-3 shape: rotated anisotropic diffusion + RS + GMRES."""
    S = diffusion_stencil_2d(epsilon=1e-3, theta=0.0, type="FD")
    A = stencil_grid(S, (32, 32)).tocsr()
    ml = ruge_stuben_solver(A)
    b = np.random.default_rng(2).random(A.shape[0])
    res = []
    ml.solve(b, tol=1e-8, maxiter=60, accel="gmres", residuals=res)
    assert res[-1] / res[0] < 1e-7
    assert len(res) < 30


def test_rs_pmis_variant():
    A = poisson((30, 30), format="csr")
    ml = ruge_stuben_solver(A, CF="PMIS", interpolation="distance_two")
    b = np.random.default_rng(3).random(A.shape[0])
    res = []
    ml.solve(b, tol=1e-8, maxiter=80, residuals=res)
    assert avg_factor(res) < 0.6


def test_local_air_restriction():
    A, rhs = advection_2d((12, 12))
    S = classical_strength_of_connection(A, theta=0.3, norm="min")
    splitting = RS(S, second_pass=True)
    R = local_air(A, splitting, theta=0.1, degree=2)
    nc = (splitting == C_NODE).sum()
    assert R.shape == (nc, 144)
    # (R A) should be small on F columns
    RA = (R @ A).toarray()
    Fcols = np.flatnonzero(splitting == F_NODE)
    offF = np.abs(RA[:, Fcols]).max()
    assert offF < 0.3 * np.abs(A.data).max(), offF


def test_air_advection_convergence():
    """AIR on upwind advection (SURVEY.md §6: rho ~ 0.05-0.3)."""
    A, rhs = advection_2d((24, 24))
    ml = air_solver(A)
    b = np.random.default_rng(4).random(A.shape[0])
    res = []
    ml.solve(b, tol=1e-10, maxiter=60, residuals=res)
    factor = avg_factor(res)
    assert res[-1] / res[0] < 1e-9
    assert factor < 0.55, f"AIR factor {factor}"


def test_cr_splitting():
    from pyamg_tpu.classical import CR

    A = poisson((12, 12)).tocsr()
    splitting = CR(A)
    assert set(np.unique(splitting)).issubset({F_NODE, C_NODE})
    nc = (splitting == C_NODE).sum()
    assert 0 < nc < A.shape[0]


def test_binormalize():
    from pyamg_tpu.classical import binormalize

    rng = np.random.default_rng(5)
    A = poisson((8, 8)).tocsr()
    d = 1 + 10 * rng.random(A.shape[0])
    D = sp.dia_matrix((d.reshape(1, -1), [0]), shape=A.shape)
    B = binormalize((D @ A @ D).tocsr())
    rownorms = np.sqrt(np.asarray(B.multiply(B).sum(axis=1)).ravel())
    assert rownorms.std() / rownorms.mean() < 0.5
