"""Strength-of-connection vs golden loop references (SURVEY.md §4 idiom 1)."""

import numpy as np
import scipy.sparse as sp

from pyamg_tpu.gallery import poisson, stencil_grid, diffusion_stencil_2d
from pyamg_tpu.strength import (
    classical_strength_of_connection,
    symmetric_strength_of_connection,
    distance_strength_of_connection,
    affinity_distance,
    algebraic_distance,
    energy_based_strength_of_connection,
    evolution_strength_of_connection,
)


def reference_classical_soc_abs(A, theta):
    """Slow dense loop: |A_ij| >= theta * max_{k != i} |A_ik|."""
    A = A.toarray()
    n = A.shape[0]
    S = np.zeros_like(A, dtype=bool)
    for i in range(n):
        off = np.abs(A[i]).copy()
        off[i] = 0
        m = off.max()
        for j in range(n):
            if j != i and off[j] >= theta * m and off[j] > 0:
                S[i, j] = True
    return S


def reference_symmetric_soc(A, theta):
    A = A.toarray()
    n = A.shape[0]
    S = np.zeros_like(A, dtype=bool)
    d = np.abs(np.diag(A))
    for i in range(n):
        for j in range(n):
            if i != j and A[i, j] != 0 and \
               abs(A[i, j]) >= theta * np.sqrt(d[i] * d[j]):
                S[i, j] = True
    return S


def _pattern_offdiag(S):
    S = sp.csr_matrix(S).copy()
    S.setdiag(0)
    S.eliminate_zeros()
    return (S.toarray() != 0)


def test_classical_soc_abs_vs_reference():
    rng = np.random.default_rng(0)
    A = poisson((8, 8)).tocsr()
    A.data += 0.01 * rng.standard_normal(A.nnz)
    for theta in (0.0, 0.25, 0.5):
        S = classical_strength_of_connection(A, theta=theta)
        ref = reference_classical_soc_abs(A, theta)
        np.testing.assert_array_equal(_pattern_offdiag(S), ref)


def test_classical_soc_min_anisotropic():
    # anisotropic: only strong in one direction for small epsilon
    S2 = diffusion_stencil_2d(epsilon=1e-4, theta=0.0, type="FD")
    A = stencil_grid(S2, (10, 10)).tocsr()
    S = classical_strength_of_connection(A, theta=0.25, norm="min")
    # interior rows should have exactly 2 strong neighbors (strong axis)
    lens = np.diff(S.indptr) - 1  # minus diagonal
    interior = lens[np.flatnonzero(lens == lens.max())]
    assert lens.max() == 2


def test_symmetric_soc_vs_reference():
    A = poisson((7, 7)).tocsr()
    for theta in (0.1, 0.5):
        S = symmetric_strength_of_connection(A, theta=theta)
        ref = reference_symmetric_soc(A, theta)
        np.testing.assert_array_equal(_pattern_offdiag(S), ref)


def test_symmetric_soc_theta0():
    A = poisson((6, 6)).tocsr()
    S = symmetric_strength_of_connection(A, theta=0)
    assert S.shape == A.shape
    # theta=0 keeps the full off-diagonal pattern
    np.testing.assert_array_equal(_pattern_offdiag(S),
                                  _pattern_offdiag(A))


def test_distance_soc():
    A = poisson((5, 5)).tocsr()
    X, Y = np.meshgrid(np.arange(5.0), np.arange(5.0), indexing="ij")
    V = np.stack([X.ravel(), Y.ravel()], axis=1)
    S = distance_strength_of_connection(A, V, theta=2.0)
    # all grid neighbors are equidistant -> full pattern kept
    np.testing.assert_array_equal(_pattern_offdiag(S), _pattern_offdiag(A))


def test_relaxation_based_measures_run():
    A = poisson((10, 10)).tocsr()
    for fn in (algebraic_distance, affinity_distance):
        S = fn(A)
        assert S.shape == A.shape
        assert S.nnz > A.shape[0]  # keeps some neighbors
    S = energy_based_strength_of_connection(A, theta=0.1)
    assert S.shape == A.shape
    S = evolution_strength_of_connection(A, epsilon=4.0, k=2)
    assert S.shape == A.shape
    # evolution on isotropic Poisson keeps grid neighbors
    assert S.nnz >= A.shape[0]


def test_empty_trailing_row():
    # regression (ADVICE r1): a CSR whose last row stores no entries put
    # index == len(data) into the reduceat offset list -> IndexError
    A = sp.csr_matrix(np.array([[2.0, -1.0, 0.0],
                                [-1.0, 2.0, 0.0],
                                [0.0, 0.0, 0.0]]))
    A.eliminate_zeros()
    assert np.diff(A.indptr)[-1] == 0
    S = classical_strength_of_connection(A, theta=0.25)
    assert S.shape == A.shape
    # empty row stays empty apart from the unit diagonal
    assert np.diff(S.indptr)[-1] <= 1


def _reference_evolution_soc(A, B=None, epsilon=4.0, k=2, proj_type="l2",
                             symmetrize_measure=True):
    """Dense golden loop for evolution strength (SURVEY.md §4 idiom 1):
    the same definition as strength.evolution_strength_of_connection,
    written as explicit per-row dense loops."""
    from pyamg_tpu.util.linalg import approximate_spectral_radius

    Acsr = sp.csr_matrix(A)
    n = Acsr.shape[0]
    if B is None:
        B = np.ones((n, 1))
    B = np.asarray(B, dtype=float).reshape(n, -1)
    nb = B.shape[1]
    d = Acsr.diagonal()
    dinv = np.where(d != 0, 1.0 / np.where(d != 0, d, 1), 0.0)
    DinvA = Acsr.multiply(dinv[:, None]).toarray()
    rho = approximate_spectral_radius(sp.csr_matrix(DinvA))
    S = np.eye(n) - DinvA / rho
    # S^k with the final product masked to pattern(A)
    full = np.linalg.matrix_power(S, k)
    patt = (Acsr.toarray() != 0)
    Atilde = np.where(patt, full, 0.0)

    dist = np.full((n, n), np.inf)
    for i in range(n):
        J = np.flatnonzero(patt[i])
        z = Atilde[i, J]
        w = np.abs(d[J]) if proj_type == "D_A" else np.ones(len(J))
        G = (B[J] * w[:, None]).T @ B[J]
        g = (B[J] * w[:, None]).T @ z
        K = np.zeros((nb + 1, nb + 1))
        K[:nb, :nb] = G
        K[:nb, nb] = B[i]
        K[nb, :nb] = B[i]
        rhs = np.concatenate([g, [Atilde[i, i]]])
        sol = np.linalg.pinv(K) @ rhs   # min-norm, like the library
        a = sol[:nb]
        for jj, j in enumerate(J):
            dist[i, j] = abs(B[j] @ a - z[jj])
        dist[i, i] = 0.0
    if symmetrize_measure:
        have = np.isfinite(dist)
        sym = np.where(have & have.T, 0.5 * (dist + dist.T), np.inf)
        sym = np.where(have & ~have.T, 0.5 * dist, sym)
        sym = np.where(~have & have.T, 0.5 * dist.T, sym)
        dist = sym
    Sout = np.zeros((n, n))
    for i in range(n):
        off = [j for j in range(n) if j != i and np.isfinite(dist[i, j])]
        pos = [dist[i, j] for j in off if dist[i, j] > 0]
        rowmin = min(pos) if pos else np.inf
        for j in off:
            if np.isfinite(rowmin) and dist[i, j] <= epsilon * max(rowmin,
                                                                   1e-300):
                Sout[i, j] = 1.0 / max(dist[i, j], 1e-14)
        mx = np.abs(Sout[i]).max()
        if mx > 0:
            Sout[i] /= mx
        Sout[i, i] = 1.0
    return Sout


def test_evolution_strength_golden():
    """Vectorized evolution strength matches the dense golden loop
    entrywise (pattern AND values) — round-1 verdict item 3."""
    from pyamg_tpu.gallery import linear_elasticity

    cases = []
    cases.append((poisson((7, 7), format="csr"), None))
    S = diffusion_stencil_2d(epsilon=1e-3, theta=0.0, type="FD")
    cases.append((stencil_grid(S, (7, 7)).tocsr(), None))
    Sfe = diffusion_stencil_2d(epsilon=1e-2, theta=np.pi / 6, type="FE")
    cases.append((stencil_grid(Sfe, (6, 6)).tocsr(), None))
    for A, B in cases:
        got = evolution_strength_of_connection(A, B=B).toarray()
        want = _reference_evolution_soc(A, B=B)
        np.testing.assert_allclose(got, want, atol=1e-9)

    # multi-candidate (elasticity rigid body modes) at the scalar level
    A4, B4 = linear_elasticity((5, 5))
    got = evolution_strength_of_connection(
        sp.csr_matrix(A4), B=B4).toarray()
    want = _reference_evolution_soc(sp.csr_matrix(A4), B=B4)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_evolution_strength_bsr_block_min():
    """BSR input amalgamates with per-block minimum (min_blocks)."""
    from pyamg_tpu.gallery import linear_elasticity

    A4, B4 = linear_elasticity((6, 6))
    Sb = evolution_strength_of_connection(A4, B=B4)
    nb = A4.shape[0] // 2
    assert Sb.shape == (nb, nb)
    assert np.allclose(Sb.diagonal(), 1.0)
    assert Sb.nnz > nb  # keeps real neighbor blocks


def test_evolution_strength_anisotropy_direction():
    """On strongly anisotropic FD diffusion the evolution measure keeps
    the strong (x) direction and drops the weak (y) couplings."""
    S = diffusion_stencil_2d(epsilon=1e-3, theta=0.0, type="FD")
    A = stencil_grid(S, (10, 10)).tocsr()
    nx = 10
    i = 5 * nx + 5  # interior point
    # default epsilon: x-neighbors dominate (scaled to the row max)
    row = evolution_strength_of_connection(
        A, epsilon=4.0).getrow(i).toarray().ravel()
    assert row[i - 1] > 0.99 and row[i + 1] > 0.99
    assert row[i - nx] < 0.5 and row[i + nx] < 0.5
    # tighter drop tolerance removes the weak direction entirely
    row = evolution_strength_of_connection(
        A, epsilon=2.0).getrow(i).toarray().ravel()
    assert row[i - 1] > 0 and row[i + 1] > 0, "strong x-neighbors dropped"
    assert row[i - nx] == 0 and row[i + nx] == 0, "weak y-neighbors kept"


def test_rootnode_evolution_default():
    """rootnode_solver's reference default strength ('evolution') now
    works with the exact algorithm: Poisson converges fast."""
    import pyamg_tpu

    A = poisson((32, 32), format="csr")
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        ml = pyamg_tpu.rootnode_solver(A, strength="evolution")
    b = np.ones(A.shape[0])
    res = []
    ml.solve(b, tol=1e-8, maxiter=40, accel="cg", residuals=res)
    f = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
    assert f < 0.25, f
