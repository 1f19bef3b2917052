"""Interleaved batched V-cycle (sparse/interleaved.py +
engine/batched_cycle.py, round 5).

CPU runs exercise the reference interleaved apply path (circular-roll
DIA semantics, identical math to the Pallas kernels); the Pallas path
itself was validated on TPU by scripts/probe_interleaved_cycle.py
(parity 5.3e-7 vs the vmapped cycle at 2048^2 lane_align, per-RHS
1.00 ms net vs 1.39 vmapped, amortization 2.46x vs 1.78)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pyamg_tpu.engine import device_sa_setup
from pyamg_tpu.engine.batched_cycle import (interleaved_zero_vcycle,
                                            supports_interleaved)
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse.interleaved import (from_interleaved,
                                          int_jacobi_step,
                                          int_jacobi_zero_res,
                                          int_spmv_add, int_spmv_scaled,
                                          to_interleaved)


@pytest.fixture(scope="module")
def lane_hierarchy():
    grid = (24, 512)
    A = poisson(grid, format="csr")
    dsa = device_sa_setup(A, grid=grid, dtype=jnp.float32,
                          max_coarse=60, lane_align=True)
    return dsa.hierarchy


def test_roundtrip_layout():
    rng = np.random.default_rng(0)
    Xk = jnp.asarray(rng.standard_normal((8, 1024)), dtype=jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(from_interleaved(to_interleaved(Xk))), np.asarray(Xk))


def test_kernel_building_blocks(lane_hierarchy):
    """Each interleaved op vs its K-major formulation."""
    h = lane_hierarchy
    lvl = h.levels[0]
    A = lvl.A
    n_pad = A.n_pad
    rng = np.random.default_rng(1)
    Bk = jnp.asarray(rng.standard_normal((8, n_pad)), dtype=jnp.float32)
    Bi = to_interleaved(Bk)
    dinv, omega = lvl.pre.arrays
    wd = omega * dinv

    def kmajor_apply(Xk):
        Y = A.data[0][None, :] * jnp.roll(Xk, -A.offsets[0], axis=1)
        for d in range(1, len(A.offsets)):
            Y = Y + A.data[d][None, :] * jnp.roll(Xk, -A.offsets[d],
                                                  axis=1)
        return Y

    X, R = int_jacobi_zero_res(A, wd, Bi)
    Xk_ref = wd[None, :] * Bk
    np.testing.assert_allclose(np.asarray(from_interleaved(X)),
                               np.asarray(Xk_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(from_interleaved(R)),
        np.asarray(Bk - kmajor_apply(Xk_ref)), rtol=1e-5, atol=1e-5)

    tv = lvl.R.tv
    Z = int_spmv_scaled(lvl.R.St, R, tv)
    St = lvl.R.St
    Rk = from_interleaved(R)
    Zk_ref = tv[None, :] * (
        St.data[0][None, :] * jnp.roll(Rk, -St.offsets[0], axis=1)
        + sum(St.data[d][None, :] * jnp.roll(Rk, -St.offsets[d], axis=1)
              for d in range(1, len(St.offsets))))
    np.testing.assert_allclose(np.asarray(from_interleaved(Z)),
                               np.asarray(Zk_ref), rtol=1e-5,
                               atol=1e-5)

    Y = int_spmv_add(A, Bi, X)
    np.testing.assert_allclose(
        np.asarray(from_interleaved(Y)),
        np.asarray(Xk_ref + kmajor_apply(Bk)), rtol=1e-5, atol=1e-5)

    X2 = int_jacobi_step(A, wd, Bi, X)
    np.testing.assert_allclose(
        np.asarray(from_interleaved(X2)),
        np.asarray(Xk_ref + wd[None, :] * (Bk - kmajor_apply(Xk_ref))),
        rtol=1e-5, atol=1e-5)


def test_cycle_parity_vs_vmapped(lane_hierarchy):
    """The whole interleaved zero V-cycle equals the vmapped K-major
    cycle lane for lane."""
    h = lane_hierarchy
    assert supports_interleaved(h)
    K = 8
    Bk = jnp.asarray(
        np.random.default_rng(2).standard_normal((K, h.levels[0].n_pad)),
        dtype=jnp.float32)
    oc = _make_cycle(len(h.levels), "V")
    ref = jax.vmap(oc.zero, in_axes=(None, 0))(h, Bk)
    out = from_interleaved(
        jax.jit(interleaved_zero_vcycle)(h, to_interleaved(Bk)))
    err = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert err < 2e-5, err


def test_supports_gating():
    """Non-lane-aligned hierarchies are rejected, not miscomputed."""
    grid = (24, 512)
    A = poisson(grid, format="csr")
    dsa = device_sa_setup(A, grid=grid, dtype=jnp.float32,
                          max_coarse=60, lane_align=False)
    h = dsa.hierarchy
    assert not supports_interleaved(h)
    with pytest.raises(ValueError, match="interleaved"):
        interleaved_zero_vcycle(
            h, jnp.zeros((h.levels[0].n_pad // 128, 8, 128),
                         dtype=jnp.float32))


def test_interleaved_batched_cg(lane_hierarchy):
    """End-to-end multi-RHS CG on interleaved stacks: per-lane
    convergence matching the single-RHS device solve (11 iters on this
    problem), lanes self-frozen after convergence."""
    from pyamg_tpu.engine.batched_cycle import interleaved_batched_cg
    from pyamg_tpu.gallery import poisson

    h = lane_hierarchy
    grid = (24, 512)
    A = poisson(grid, format="csr")
    n = A.shape[0]
    n_pad = h.levels[0].n_pad
    K = 4
    rng = np.random.default_rng(3)
    B = rng.standard_normal((K, n))
    Bg = np.zeros((K, 24, 768))
    Bg[:, :, :512] = B.reshape(K, 24, 512)
    Bk = jnp.asarray(Bg.reshape(K, n_pad), dtype=jnp.float32)
    X, hist = jax.jit(lambda hh, b: interleaved_batched_cg(
        hh, b, tol=1e-6, maxiter=60))(h, Bk)
    Xg = np.asarray(X).reshape(K, 24, 768)[:, :, :512].reshape(K, n)
    hist = np.asarray(hist)
    for k in range(K):
        hk = hist[:, k]
        hk = hk[~np.isnan(hk)]
        r = np.linalg.norm(B[k] - A @ Xg[k].astype(np.float64)) \
            / np.linalg.norm(B[k])
        assert r < 5e-6, (k, r)
        assert len(hk) - 1 <= 15, (k, len(hk) - 1)


def test_solve_routes_to_interleaved_cg():
    """StructuredDeviceSolver.solve with an (n, K) RHS + accel='cg' on a
    lane-aligned f32 hierarchy takes the interleaved fast path
    automatically, with lane-for-lane convergence parity vs the vmapped
    fallback."""
    grid = (24, 512)
    A = poisson(grid, format="csr")
    n = A.shape[0]
    K = 4
    B = np.random.default_rng(5).standard_normal((n, K))

    dsa = device_sa_setup(A, grid=grid, dtype=jnp.float32,
                          max_coarse=60, lane_align=True)
    res = []
    X = dsa.solve(B, tol=1e-6, maxiter=60, accel="cg", residuals=res)
    assert ("int_cg", 60) in dsa._jit_cache     # the fast path ran
    for k in range(K):
        r = np.linalg.norm(B[:, k] - A @ X[:, k].astype(np.float64)) \
            / np.linalg.norm(B[:, k])
        assert r < 5e-6, (k, r)

    dsa2 = device_sa_setup(A, grid=grid, dtype=jnp.float32,
                           max_coarse=60, lane_align=False)
    res2 = []
    dsa2.solve(B, tol=1e-6, maxiter=60, accel="cg", residuals=res2)
    assert ("int_cg", 60) not in dsa2._jit_cache  # vmapped fallback
    assert [len(r) for r in res] == [len(r) for r in res2]


@pytest.mark.skipif(
    __import__("jax").default_backend() == "tpu",
    reason="interpret-mode check is for CPU CI; TPU runs the real kernel")
def test_pallas_kernels_interpret_mode(lane_hierarchy):
    """Run the ACTUAL Pallas kernel code (not the reference fallback)
    under the Pallas interpreter and compare against the reference
    interleaved apply — validates _shift_read's clamped-halo logic and
    the fused epilogues without TPU hardware.

    pltpu.roll has no interpreter implementation on some versions; the
    test skips gracefully in that case."""
    import pyamg_tpu.sparse.interleaved as il

    h = lane_hierarchy
    A = h.levels[0].A
    n_pad = A.n_pad
    if il._pick_block(n_pad, A.offsets) is None:
        pytest.skip("no admissible kernel block for this size")
    rng = np.random.default_rng(4)
    Bk = jnp.asarray(rng.standard_normal((8, n_pad)), dtype=jnp.float32)
    Bi = to_interleaved(Bk)
    dinv, omega = h.levels[0].pre.arrays
    wd = (omega * dinv).reshape(-1, 128)
    try:
        X, R = il._run(A, "zero_res", [(Bi, False), (wd, True)], [],
                       out_count=2, interpret=True)
    except Exception as e:       # pltpu.roll unsupported in interpreter
        pytest.skip(f"pallas interpreter unavailable: {type(e).__name__}")
    Xr, Rr = il.int_jacobi_zero_res(A, omega * dinv, Bi)  # reference
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xr),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(R), np.asarray(Rr),
                               rtol=1e-4, atol=1e-4)
