"""Gallery generators: shapes, symmetry, definiteness."""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.sparse.linalg import eigsh

from pyamg_tpu.gallery import (
    advection_2d,
    diffusion_stencil_2d,
    gauge_laplacian,
    linear_elasticity,
    linear_elasticity_p1,
    load_example,
    poisson,
    recirc_flow,
    regular_triangle_mesh,
    sprand,
    stencil_grid,
)


def is_spd(A, k=4):
    A = sp.csr_matrix(A)
    sym = abs(A - A.T).max() < 1e-10 * abs(A).max()
    if not sym:
        return False
    lam = eigsh(A.astype(np.float64), k=1, which="SA",
                return_eigenvectors=False)
    return lam[0] > -1e-10 * abs(A).max()


def test_stencil_grid_1d():
    A = stencil_grid([-1.0, 2.0, -1.0], (5,))
    expected = np.array(
        [[2, -1, 0, 0, 0],
         [-1, 2, -1, 0, 0],
         [0, -1, 2, -1, 0],
         [0, 0, -1, 2, -1],
         [0, 0, 0, -1, 2]], dtype=float)
    np.testing.assert_array_equal(A.toarray(), expected)


def test_stencil_grid_2d_5pt():
    A = stencil_grid(
        np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float), (3, 3)
    )
    assert A.shape == (9, 9)
    assert A.nnz == 9 * 5 - 4 * 3  # interior 5, edges lose entries
    # row of the center node
    center = A[4].toarray().ravel()
    assert center[4] == 4
    assert center[1] == center[3] == center[5] == center[7] == -1


def test_poisson_dims():
    for grid in [(10,), (6, 7), (4, 5, 6)]:
        A = poisson(grid)
        n = int(np.prod(grid))
        assert A.shape == (n, n)
        assert is_spd(A)


def test_poisson_fe():
    A = poisson((8, 8), type="FE")
    assert is_spd(A)


def test_diffusion_stencil():
    for typ in ("FD", "FE"):
        S = diffusion_stencil_2d(epsilon=1e-3, theta=np.pi / 6, type=typ)
        A = stencil_grid(S, (10, 10))
        assert is_spd(A), f"{typ} diffusion not SPD"
    # isotropic FD reduces to 5-point Laplacian
    S = diffusion_stencil_2d(epsilon=1.0, theta=0.0, type="FD")
    np.testing.assert_allclose(
        S, [[0, -1, 0], [-1, 4, -1], [0, -1, 0]], atol=1e-14
    )


def test_advection_2d():
    A, rhs = advection_2d((8, 8))
    assert A.shape == (64, 64)
    assert abs(A - A.T).max() > 0  # nonsymmetric
    # M-matrix structure: positive diagonal, nonpositive offdiag
    assert (A.diagonal() > 0).all()
    off = A - sp.diags(A.diagonal())
    assert (off.data <= 1e-14).all()
    # constant solution: A @ 1 == rhs for interior consistency
    x = np.ones(64)
    np.testing.assert_allclose(A @ x, rhs, atol=1e-10)


def test_recirc_flow():
    A = recirc_flow((16, 16), epsilon=1e-2)
    assert A.shape == (256, 256)
    assert abs(A - A.T).max() > 0
    # row sums ~ 0 except boundary-adjacent (Dirichlet drops entries)
    assert (A.diagonal() > 0).all()


def test_linear_elasticity():
    A, B = linear_elasticity((6, 6))
    assert A.format == "bsr"
    assert A.blocksize == (2, 2)
    assert B.shape == (A.shape[0], 3)
    assert is_spd(A.tocsr())


def test_linear_elasticity_p1():
    V, E = regular_triangle_mesh(5, 5)
    A, B = linear_elasticity_p1(V, E)
    assert A.shape == (50, 50)
    assert B.shape == (50, 3)
    # rigid body modes are in the nullspace of the floating structure
    for c in range(3):
        np.testing.assert_allclose(A @ B[:, c], 0, atol=1e-8 * abs(A).max())


def test_gauge_laplacian():
    A = gauge_laplacian(8, beta=0.1)
    assert A.shape == (64, 64)
    assert np.iscomplexobj(A.data)
    # Hermitian
    assert abs(A - A.conjugate().T).max() < 1e-12


def test_sprand():
    A = sprand(50, 40, 0.1, seed=0)
    assert A.shape == (50, 40)
    assert 0 < A.nnz <= 200


def test_load_example():
    for name in ("recirc_flow", "unit_square", "bar", "knot"):
        data = load_example(name)
        assert "A" in data
        assert data["A"].shape[0] > 10
    with pytest.raises(ValueError):
        load_example("nonexistent")
