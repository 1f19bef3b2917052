"""Native (C++) kernel parity: the OpenMP setup kernels added in round 2
must match their scipy/NumPy reference formulations exactly.

Complements the implicit coverage (every solver setup routes through
them when the extension is built) with direct adversarial inputs:
unsorted indices, empty rows, missing diagonals, int32 vs int64 index
arrays.
"""
import numpy as np
import pytest
import scipy.sparse as sp

from pyamg_tpu.gallery import poisson

amg_core = pytest.importorskip("pyamg_tpu.amg_core")
if not getattr(amg_core, "AVAILABLE", False):
    pytest.skip("native amg_core not built", allow_module_level=True)


def _rand_csr(n, m, density, seed, idx_dtype=np.int32):
    A = sp.random(n, m, density=density, random_state=seed,
                  format="csr")
    A.indices = A.indices.astype(idx_dtype)
    A.indptr = A.indptr.astype(idx_dtype)
    return A


@pytest.mark.parametrize("idx", [np.int32, np.int64])
def test_spgemm_matches_scipy(idx):
    A = _rand_csr(300, 200, 0.03, 0, idx)
    B = _rand_csr(200, 150, 0.04, 1, idx)
    C = amg_core.spgemm(A, B)
    D = abs(C - sp.csr_matrix(A @ B))
    assert (D.max() if D.nnz else 0.0) < 1e-14
    assert C.has_sorted_indices


def test_spgemm_unsorted_and_empty_rows():
    A = sp.csr_matrix(np.diag([1.0, 2, 0, 3]))
    A.eliminate_zeros()
    B = _rand_csr(4, 5, 0.5, 2)
    # shuffle B's column order within rows
    rng = np.random.default_rng(3)
    for i in range(B.shape[0]):
        s, e = B.indptr[i], B.indptr[i + 1]
        p = rng.permutation(e - s)
        B.indices[s:e] = B.indices[s:e][p]
        B.data[s:e] = B.data[s:e][p]
    B.has_sorted_indices = False
    C = amg_core.spgemm(A, B)
    D = abs(C - sp.csr_matrix(A @ B))
    assert (D.max() if D.nnz else 0.0) < 1e-14


@pytest.mark.parametrize("dinv_none", [False, True])
def test_jacobi_smooth_fused(dinv_none):
    A = poisson((20, 20), format="csr")
    P = _rand_csr(400, 90, 0.02, 4)
    dinv = (None if dinv_none
            else np.random.default_rng(5).random(400))
    out = amg_core.jacobi_smooth(A, P, dinv, 0.63)
    S = A if dinv_none else sp.dia_matrix(
        (dinv.reshape(1, -1), [0]), shape=A.shape) @ A
    ref = sp.csr_matrix(P - 0.63 * sp.csr_matrix(S @ P))
    D = abs(out - ref)
    assert (D.max() if D.nnz else 0.0) < 1e-13


@pytest.mark.parametrize("theta", [0.0, 0.25])
@pytest.mark.parametrize("idx", [np.int32, np.int64])
def test_symmetric_strength_native_vs_python(theta, idx):
    from pyamg_tpu.strength import symmetric_strength_of_connection

    A = poisson((15, 17), format="csr")
    A.data += 0.01 * np.random.default_rng(6).standard_normal(A.nnz)
    A = sp.csr_matrix((A + A.T) / 2)
    A.indices = A.indices.astype(idx)
    A.indptr = A.indptr.astype(idx)
    S_native = symmetric_strength_of_connection(A, theta)
    import os
    data_out, keep, n_diag = amg_core.symmetric_strength(
        A.indptr, A.indices, A.data, theta)
    assert n_diag == A.shape[0]
    # python path for reference
    os.environ["PYAMG_TPU_NO_NATIVE"] = "1"
    try:
        import pyamg_tpu.amg_core._loader as L
        old_cached, old_tried = L._cached, L._tried
        L._cached, L._tried = None, True
        S_py = symmetric_strength_of_connection(A, theta)
    finally:
        del os.environ["PYAMG_TPU_NO_NATIVE"]
        L._cached, L._tried = old_cached, old_tried
    D = abs(sp.csr_matrix(S_native) - sp.csr_matrix(S_py))
    assert (D.max() if D.nnz else 0.0) < 1e-14


def test_symmetric_strength_missing_diag_falls_back():
    """Rows without a stored diagonal route to the python fallback
    (which adds the unit diagonal via sparse add)."""
    from pyamg_tpu.strength import symmetric_strength_of_connection

    A = sp.csr_matrix(np.array([[0.0, -1, 0],
                                [-1, 2.0, -1],
                                [0, -1, 2.0]]))
    A.eliminate_zeros()          # row 0 has no stored diagonal
    S = symmetric_strength_of_connection(A, 0)
    assert abs(S.diagonal() - 1.0).max() < 1e-15
