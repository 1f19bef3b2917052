"""Device UNSTRUCTURED SA setup (engine/unstructured_setup.py, round 4).

Verifies the gather-free windowed pipeline against exact host linear
algebra: the banded chain-probed RAP must match scipy's P^T A P
ENTRYWISE (the probing recovers true values, not approximations), and
the end-to-end device solve must reach convergence parity with host SA
on the same matrix (VERDICT r3 item 1's done-criterion).
Reference counterpart: pyamg aggregation setup on arbitrary CSR
matrices (SURVEY.md §2.2 S:116-118, §7 step 5)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from pyamg_tpu.gallery import gradgradform, regular_triangle_mesh
from pyamg_tpu.engine.unstructured_setup import (
    _SpanPlan, device_unstructured_sa_setup)


def _fem_matrix(nx):
    V, E = regular_triangle_mesh(nx, nx)
    A = sp.csr_matrix(gradgradform(V, E))
    # small shift makes it SPD (pure Neumann stiffness is singular)
    return (A + 1e-2 * sp.eye(A.shape[0], format="csr")).tocsr()


def _windowed_to_scipy(W):
    data = np.asarray(W.data)
    idx = np.asarray(W.idx)
    starts = np.asarray(W.starts)
    nb, k, B = data.shape
    rows = np.broadcast_to(
        (np.arange(nb) * B)[:, None, None]
        + np.arange(B)[None, None, :], data.shape).ravel()
    cols = (starts[:, None, None] * W.w2 + idx).ravel()
    vals = data.ravel()
    keep = (vals != 0) & (rows < W.shape[0])
    ncols = max(W.shape[1], int(cols[keep].max()) + 1 if keep.any() else 1)
    M = sp.coo_matrix((vals[keep], (rows[keep], cols[keep])),
                      shape=(W.shape[0], ncols))
    return sp.csr_matrix(M)


class TestSpanPlan:
    def test_range_queries_exact(self):
        rng = np.random.default_rng(3)
        n = 4096
        A = sp.random(n, n, density=0.002, random_state=rng,
                      format="csr")
        A = A + sp.eye(n, format="csr")
        A.sort_indices()
        plan = _SpanPlan.from_csr(A)
        gr = plan.gr
        ng = len(plan.lo)
        g0 = rng.integers(0, ng, size=200)
        g1 = np.minimum(g0 + rng.integers(0, ng, size=200), ng - 1)
        lo, hi = plan._range_minmax(g0.astype(np.int64),
                                    g1.astype(np.int64))
        for a, b, lo_e, hi_e in zip(g0, g1, lo, hi):
            assert lo_e == plan.lo[a:b + 1].min()
            assert hi_e == plan.hi[a:b + 1].max()

    def test_hull_contains_neighbors(self):
        A = _fem_matrix(30)
        plan = _SpanPlan.from_csr(A)
        lo = np.array([100, 400], dtype=np.int64)
        hi = np.array([200, 500], dtype=np.int64)
        h_lo, h_hi = plan.hull(lo, hi, 1)
        # every column reachable from rows [lo, hi) must be inside
        for j in range(2):
            sub = A[int(lo[j]):int(hi[j])]
            assert sub.indices.min() >= h_lo[j]
            assert sub.indices.max() < h_hi[j]


class TestUnstructuredSetup:
    @pytest.mark.parametrize("nx", [24, 48])
    def test_rap_entrywise_exact(self, nx):
        """Chain-probed banded RAP == scipy P^T A P entrywise at every
        level (f32 tolerance) — the probing is exact, not approximate."""
        A = _fem_matrix(nx)
        dsa = device_unstructured_sa_setup(A, max_coarse=30)
        h = dsa.hierarchy
        A_sp = A
        for lvl in range(len(h.levels) - 1):
            P = _windowed_to_scipy(h.levels[lvl].P)
            n1 = h.levels[lvl + 1].n
            P = P[:, :n1]
            RAP = (P.T @ A_sp @ P).tocsr()
            A1 = h.levels[lvl + 1].A
            if type(A1).__name__ == "DenseOperator":
                A1_sp = sp.csr_matrix(
                    np.asarray(A1.data)[:n1, :n1].astype(np.float64))
            else:
                A1_sp = _windowed_to_scipy(A1)[:n1, :n1]
            err = abs(RAP - A1_sp).max()
            assert err <= 2e-5 * max(abs(RAP).max(), 1e-30), \
                f"level {lvl}: RAP mismatch {err}"
            assert RAP.nnz == A1_sp.nnz
            A_sp = RAP

    def test_solve_convergence_parity(self):
        """Device CG on the unstructured hierarchy within +-3 iterations
        of host SA built with the same (jacobi) smoother class."""
        A = _fem_matrix(40)
        n = A.shape[0]
        rng = np.random.default_rng(0)
        b = rng.standard_normal(n)

        from pyamg_tpu.aggregation import smoothed_aggregation_solver
        smoo = ("jacobi", {"omega": 4.0 / 3.0})
        ml = smoothed_aggregation_solver(A, max_coarse=50,
                                         presmoother=smoo,
                                         postsmoother=smoo)
        res_h = []
        ml.solve(b, tol=1e-6, maxiter=60, accel="cg", residuals=res_h)

        dsa = device_unstructured_sa_setup(A, max_coarse=50)
        res_d = []
        x = dsa.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6,
                      maxiter=60, accel="cg", residuals=res_d)
        res_d = [r for r in np.asarray(res_d) if not np.isnan(r)]
        it_h = len(res_h) - 1
        it_d = len(res_d) - 1
        assert it_d <= it_h + 3, (it_d, it_h)
        # true residual check (f32 floor)
        r = np.linalg.norm(b - A @ np.asarray(x[:n], dtype=np.float64))
        assert r / np.linalg.norm(b) < 1e-4

    def test_chebyshev_smoother_path(self):
        A = _fem_matrix(30)
        n = A.shape[0]
        cheb = ("chebyshev", {"degree": 3})
        dsa = device_unstructured_sa_setup(A, max_coarse=50,
                                           presmoother=cheb,
                                           postsmoother=cheb)
        b = np.ones(n)
        res = []
        dsa.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6,
                  maxiter=40, accel="cg", residuals=res)
        res = [r for r in np.asarray(res) if not np.isnan(r)]
        iters = len(res) - 1
        rho = (res[-1] / res[0]) ** (1.0 / max(iters, 1))
        assert rho < 0.35, rho

    def test_rejects_non_windowable(self):
        rng = np.random.default_rng(0)
        # random sparsity over a span much wider than max_w2=16384:
        # column spans exceed any admissible window under the natural
        # ordering, so the windowed converter must bail out
        n = 80000
        A = sp.random(n, n, density=2e-4, random_state=rng,
                      format="csr") + sp.eye(n, format="csr")
        with pytest.raises(ValueError, match="windowable"):
            device_unstructured_sa_setup(A.tocsr(), max_coarse=50)

    def test_candidate_vector_b(self):
        """A user-supplied near-nullspace candidate flows through the
        tentative fit (scaled ones reproduce the default hierarchy)."""
        A = _fem_matrix(24)
        n = A.shape[0]
        dsa1 = device_unstructured_sa_setup(A, max_coarse=30)
        dsa2 = device_unstructured_sa_setup(A, B=2.5 * np.ones(n),
                                            max_coarse=30)
        b = np.ones(n)
        r1, r2 = [], []
        dsa1.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6,
                   maxiter=40, accel="cg", residuals=r1)
        dsa2.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6,
                   maxiter=40, accel="cg", residuals=r2)
        r1 = [r for r in np.asarray(r1) if not np.isnan(r)]
        r2 = [r for r in np.asarray(r2) if not np.isnan(r)]
        # scale-invariance of the tentative fit: same iteration count;
        # the histories only differ by f32 rounding near the floor
        assert abs(len(r1) - len(r2)) <= 1
        assert r2[-1] / r2[0] < 1e-5


def test_auto_route_from_device_sa_setup():
    """device_sa_setup(A) with no grid on a genuinely NON-GRID operator
    (the airfoil mesh Laplacian — detect_grid rejects it) auto-routes to
    the unstructured pipeline and solves.  SURVEY.md §7 step 5: the
    reference's setup accepts arbitrary CSR; so does the device path
    now."""
    import pytest
    from pyamg_tpu.engine import device_sa_setup
    from pyamg_tpu.engine.device_setup import detect_grid
    from pyamg_tpu.gallery import load_example

    A = sp.csr_matrix(load_example("airfoil")["A"]).astype(np.float64)
    n = A.shape[0]
    A = (A + 1e-2 * sp.eye(n, format="csr")).tocsr()
    with pytest.raises(ValueError):
        detect_grid(A)

    ds = device_sa_setup(A, max_coarse=100)
    from pyamg_tpu.engine.unstructured_setup import \
        device_unstructured_sa_setup  # noqa: F401 (routing target)
    b = np.random.default_rng(3).standard_normal(n)
    res = []
    x = ds.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6,
                 maxiter=60, accel="cg", residuals=res)
    res = [r for r in np.asarray(res) if not np.isnan(r)]
    assert res[-1] / res[0] < 1e-5
    r = np.linalg.norm(b - A @ np.asarray(x[:n], dtype=np.float64))
    assert r / np.linalg.norm(b) < 1e-3


def test_aggressive_aggregation_mode():
    """aggregate='aggressive' (radius-2 aggregates, no densify pass):
    coarsening is strictly stronger than 'standard' and CG still
    converges within a modest iteration premium."""
    import jax.numpy as jnp

    from pyamg_tpu.engine.unstructured_setup import (
        device_unstructured_sa_setup)

    A = _fem_matrix(40)     # SPD-shifted (pure Neumann is singular)
    n = A.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)

    std = device_unstructured_sa_setup(A, max_coarse=50)
    agg = device_unstructured_sa_setup(A, max_coarse=50,
                                       aggregate="aggressive")
    nc_std = std.setup_info["levels"][0]["nc"]
    nc_agg = agg.setup_info["levels"][0]["nc"]
    assert nc_agg < nc_std, (nc_agg, nc_std)
    # radius-2 aggregates: ratio should be well beyond the densified ~3
    assert n / nc_agg > 1.5 * (n / nc_std)

    res_s, res_a = [], []
    std.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6, maxiter=80,
              accel="cg", residuals=res_s)
    x = agg.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6,
                  maxiter=80, accel="cg", residuals=res_a)
    res_s = [r for r in np.asarray(res_s) if not np.isnan(r)]
    res_a = [r for r in np.asarray(res_a) if not np.isnan(r)]
    # converged, within a bounded premium over standard (round 5:
    # slot-merged transfers + measured trade-offs tightened this from
    # +12; the DEFAULT 1-pass mode is the end-to-end winner at 640k —
    # setup 3.5 s, V-cycle 4.2 ms — at a +7 iteration premium)
    assert res_a[-1] / res_a[0] < 1e-5
    assert len(res_a) - 1 <= (len(res_s) - 1) + 7, (len(res_a),
                                                    len(res_s))

    # the smooth_passes=2 quality option (composed second smoothing
    # factor) must close the premium to <= +5 — it trades setup time
    # and V-cycle cost (measured 640k: 8.4 s / 8.0 ms) for iterations
    agg2 = device_unstructured_sa_setup(A, max_coarse=50,
                                        aggregate="aggressive",
                                        smooth_passes=2)
    res_a2 = []
    agg2.solve(jnp.asarray(b, dtype=jnp.float32), tol=1e-6, maxiter=80,
               accel="cg", residuals=res_a2)
    res_a2 = [r for r in np.asarray(res_a2) if not np.isnan(r)]
    assert res_a2[-1] / res_a2[0] < 1e-5
    assert len(res_a2) - 1 <= (len(res_s) - 1) + 5, (len(res_a2),
                                                     len(res_s))
    r = np.linalg.norm(b - A @ np.asarray(x[:n], dtype=np.float64))
    assert r / np.linalg.norm(b) < 1e-4

    with pytest.raises(ValueError, match="aggregate"):
        device_unstructured_sa_setup(A, aggregate="bogus")
