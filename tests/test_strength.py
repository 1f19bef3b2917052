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
