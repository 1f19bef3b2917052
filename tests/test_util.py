"""Utilities: linalg, graph refs, serialization, vis writers."""

import io
import os

import numpy as np
import pytest
import scipy.sparse as sp

from pyamg_tpu import graph, graph_ref
from pyamg_tpu.gallery import poisson, regular_triangle_mesh
from pyamg_tpu.util import linalg
from pyamg_tpu.util.serialize import load_hierarchy, save_hierarchy
from pyamg_tpu.util.utils import (
    filter_matrix_rows,
    get_block_diag,
    profile_solver,
    scale_columns,
    scale_rows,
    symmetric_rescaling,
    truncate_rows,
)


def test_approximate_spectral_radius():
    A = poisson((20, 20)).tocsr()
    rho = linalg.approximate_spectral_radius(A)
    from scipy.sparse.linalg import eigsh
    exact = eigsh(A.astype(float), k=1, which="LA",
                  return_eigenvectors=False)[0]
    assert abs(rho - exact) / exact < 0.05


def test_ishermitian():
    A = poisson((10, 10)).tocsr()
    assert linalg.ishermitian(A)
    B = A.copy()
    B[0, 1] = 99.0
    assert not linalg.ishermitian(B.tocsr(), fast_check=False)


def test_pinv_array():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((7, 3, 3))
    orig = a.copy()
    linalg.pinv_array(a)
    for i in range(7):
        np.testing.assert_allclose(a[i] @ orig[i], np.eye(3), atol=1e-10)


def test_scale_rows_columns():
    A = poisson((5, 5)).tocsr()
    v = np.arange(1.0, 26.0)
    np.testing.assert_allclose(
        scale_rows(A, v).toarray(), np.diag(v) @ A.toarray(), atol=1e-14)
    np.testing.assert_allclose(
        scale_columns(A, v).toarray(), A.toarray() @ np.diag(v), atol=1e-14)


def test_symmetric_rescaling():
    A = poisson((6, 6)).tocsr() * 4.0
    D_sqrt, D_sqrt_inv, DAD = symmetric_rescaling(A)
    np.testing.assert_allclose(DAD.diagonal(), 1.0, atol=1e-12)


def test_get_block_diag():
    from pyamg_tpu.gallery import linear_elasticity
    A, _ = linear_elasticity((5, 5))
    Dinv = get_block_diag(A, 2, inv_flag=True)
    D = get_block_diag(A, 2, inv_flag=False)
    for i in range(Dinv.shape[0]):
        np.testing.assert_allclose(Dinv[i] @ D[i], np.eye(2), atol=1e-8)


def test_filter_truncate():
    from pyamg_tpu.gallery import diffusion_stencil_2d, stencil_grid

    S = diffusion_stencil_2d(epsilon=0.1, theta=0.0, type="FD")
    A = stencil_grid(S, (8, 8)).tocsr()
    F = filter_matrix_rows(A, 0.5)
    assert F.nnz < A.nnz
    T = truncate_rows(A, 3)
    assert (np.diff(T.indptr) <= 3).all()


def test_profile_solver():
    from pyamg_tpu import smoothed_aggregation_solver
    A = poisson((20, 20), format="csr")
    ml = smoothed_aggregation_solver(A)
    w = profile_solver(ml)
    assert 0 < w < 100


# ---------------------------------------------------------------------------
# graph vs graph_ref golden comparisons (SURVEY.md §4 idiom 1)
# ---------------------------------------------------------------------------

def test_mis_serial_matches_ref():
    A = poisson((9, 9)).tocsr()
    mis = graph.maximal_independent_set(A, algo="serial")
    ref = graph_ref.maximal_independent_set_ref(A)
    np.testing.assert_array_equal(mis, ref)


def test_mis_parallel_is_maximal():
    A = poisson((12, 12)).tocsr()
    mis = graph.maximal_independent_set(A, algo="parallel")
    assert graph_ref.is_maximal_independent_set(A, mis)


@pytest.mark.parametrize("method", ["JP", "LDF", "MIS"])
def test_coloring_valid(method):
    A = poisson((10, 10)).tocsr()
    colors = graph.vertex_coloring(A, method=method)
    assert graph_ref.is_valid_coloring(A, colors)
    assert colors.max() + 1 <= 6  # planar-ish graph, small palette


def test_bellman_ford_matches_ref():
    A = poisson((8, 8)).tocsr()
    G = A.copy()
    G.data = np.abs(G.data)
    seeds = [0, 37, 50]
    d1, n1 = graph.bellman_ford(G, seeds)
    d2, n2 = graph_ref.bellman_ford_ref(G, seeds)
    np.testing.assert_allclose(d1, d2, atol=1e-12)
    # nearest assignments may differ on ties; distances must agree
    assert (n1 >= 0).all()


def test_rcm_and_peripheral():
    A = poisson((10, 10)).tocsr()
    B = graph.symmetric_rcm(A)
    # bandwidth should not increase
    def bw(M):
        M = sp.coo_matrix(M)
        return np.abs(M.row - M.col).max()
    assert bw(B) <= bw(A)
    node, order, level = graph.pseudo_peripheral_node(A)
    assert 0 <= node < 100
    assert level.max() >= 9  # eccentricity of a 10x10 grid >= 9


# ---------------------------------------------------------------------------
# serialization + vis
# ---------------------------------------------------------------------------

def test_hierarchy_roundtrip(tmp_path):
    from pyamg_tpu import smoothed_aggregation_solver
    A = poisson((16, 16), format="csr")
    ml = smoothed_aggregation_solver(A)
    path = os.path.join(tmp_path, "h.npz")
    save_hierarchy(ml, path)
    ml2 = load_hierarchy(path)
    b = np.random.default_rng(0).random(A.shape[0])
    res1, res2 = [], []
    ml.solve(b, tol=1e-8, maxiter=20, residuals=res1)
    ml2.solve(b, tol=1e-8, maxiter=20, residuals=res2)
    np.testing.assert_allclose(res1, res2, rtol=1e-10)


def test_vis_vtu(tmp_path):
    from pyamg_tpu.aggregation import standard_aggregation
    from pyamg_tpu.strength import symmetric_strength_of_connection
    from pyamg_tpu.vis import vis_aggregate_groups, write_basic_mesh

    V, E = regular_triangle_mesh(6, 6)
    from pyamg_tpu.gallery.fem import gradgradform
    A = gradgradform(V, E)
    C = symmetric_strength_of_connection(A.tocsr())
    AggOp, _ = standard_aggregation(C)
    fname = os.path.join(tmp_path, "agg.vtu")
    pa, ca = vis_aggregate_groups(V, E, AggOp, fname=fname)
    assert os.path.exists(fname)
    text = open(fname).read()
    assert "<VTKFile" in text and "aggregate" in text
    assert (pa >= 0).all()
    buf = io.StringIO()
    write_basic_mesh(buf, V, E, mesh_type="tri")
    assert "UnstructuredGrid" in buf.getvalue()


def test_chebyshev_coefficients_property():
    """q(t) = 1 - t p(t) satisfies q(0)=1 and is small on [a, b]."""
    from pyamg_tpu.relaxation.chebyshev import chebyshev_polynomial_coefficients

    a, b, degree = 0.1, 2.0, 4
    p = chebyshev_polynomial_coefficients(a, b, degree)
    ts = np.linspace(a, b, 400)
    qt = 1.0 - ts * np.polyval(p, ts)
    # q attains exactly the Chebyshev minimax bound 1/T_d((b+a)/(b-a))
    sigma = (b + a) / (b - a)
    bound = 1.0 / np.cosh(degree * np.arccosh(sigma))
    assert np.abs(qt).max() <= bound * (1 + 1e-10)
    np.testing.assert_allclose(np.abs(qt).max(), bound, rtol=1e-6)


def test_filter_operator_preserves_modes():
    """filter_operator keeps A @ B = Bf while restricting the pattern."""
    from pyamg_tpu.util.utils import filter_operator

    rng = np.random.default_rng(0)
    A = poisson((8, 8)).tocsr()
    B = np.ones((64, 1))
    Bf = A @ B
    # restrict to a sub-pattern (drop ~30% of off-diagonal entries)
    C = A.copy()
    mask = rng.random(C.nnz) > 0.3
    rows = np.repeat(np.arange(64), np.diff(C.indptr))
    mask |= rows == C.indices
    C.data = C.data * mask
    C.eliminate_zeros()
    Af = filter_operator(A, C, B, Bf)
    np.testing.assert_allclose(Af @ B, Bf, atol=1e-10)
    assert Af.nnz <= C.nnz


def test_compute_btbinv():
    from pyamg_tpu.util.utils import compute_BtBinv

    rng = np.random.default_rng(1)
    B = rng.standard_normal((30, 2))
    C = sp.random(10, 30, density=0.4, random_state=2, format="csr")
    C.data[:] = 1.0
    G = compute_BtBinv(B, C)
    # each block is the pseudo-inverse of the local Gram matrix
    for i in range(10):
        cols = C.indices[C.indptr[i]: C.indptr[i + 1]]
        Bi = B[cols]
        np.testing.assert_allclose(G[i], np.linalg.pinv(Bi.T @ Bi),
                                   atol=1e-10)


def test_hierarchy_roundtrip_classical(tmp_path):
    """RS hierarchies (with splitting + GS smoothers) serialize too."""
    from pyamg_tpu import ruge_stuben_solver

    A = poisson((14, 14), format="csr")
    ml = ruge_stuben_solver(A)
    path = os.path.join(tmp_path, "rs.npz")
    save_hierarchy(ml, path)
    ml2 = load_hierarchy(path)
    assert hasattr(ml2.levels[0], "splitting")
    b = np.random.default_rng(3).random(A.shape[0])
    r1, r2 = [], []
    ml.solve(b, tol=1e-8, maxiter=15, residuals=r1)
    ml2.solve(b, tol=1e-8, maxiter=15, residuals=r2)
    np.testing.assert_allclose(r1, r2, rtol=1e-10)


def test_device_solver_roundtrip(tmp_path):
    """save_device_solver/load_device_solver: the production checkpoint
    path — setup once, serve from the file.  Round-trip must be bitwise
    (the hierarchy pytree's leaves are moved host<->device unchanged)."""
    import pyamg_tpu
    from pyamg_tpu.engine import compile_hierarchy, device_sa_setup
    from pyamg_tpu.engine.solver import DeviceMultilevelSolver
    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.util.serialize import (load_device_solver,
                                          save_device_solver)

    A = poisson((32, 32), format="csr")
    b = np.random.default_rng(0).random(A.shape[0])

    ml = pyamg_tpu.smoothed_aggregation_solver(A)
    dml = DeviceMultilevelSolver(compile_hierarchy(ml,
                                                   mixed_precision=True))
    x0 = dml.solve(b, tol=1e-9, maxiter=60, accel="cg", precision="mixed")
    p = tmp_path / "dml.pkl"
    save_device_solver(dml, p)
    x1 = load_device_solver(p).solve(b, tol=1e-9, maxiter=60, accel="cg",
                                     precision="mixed")
    assert np.max(np.abs(x0 - x1)) == 0.0

    ds = device_sa_setup(A, grid=(32, 32), max_coarse=60)
    y0 = ds.solve(b, tol=1e-5, maxiter=40, accel="cg")
    p2 = tmp_path / "ds.pkl"
    save_device_solver(ds, p2)
    ds2 = load_device_solver(p2)
    assert ds2.grid == (32, 32)
    y1 = ds2.solve(b, tol=1e-5, maxiter=40, accel="cg")
    assert np.max(np.abs(y0 - y1)) == 0.0
