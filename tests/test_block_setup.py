"""Block / multi-candidate device SA setup (engine/block_setup.py).

Parity idioms per SURVEY.md §4: golden consistency against the scalar
device path (the m=1 block pipeline must reproduce it), invariant checks
(per-aggregate orthonormality of the tentative prolongator), and
convergence-factor integration tests on elasticity (the BSR bs=2 target,
reference counterpart [R] pyamg/aggregation/tests/test_aggregation.py
BSR cases).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import pyamg_tpu
from pyamg_tpu.engine import device_sa_setup, device_sa_setup_block
from pyamg_tpu.engine.block_setup import (_chol_small, _spd_inv_small,
                                          _tri_inv_small)
from pyamg_tpu.gallery import linear_elasticity, poisson


def test_chol_tri_inv_small_golden():
    rng = np.random.default_rng(0)
    for m in (1, 2, 3, 4):
        X = rng.standard_normal((12, m, m))
        G = np.einsum("nij,nkj->nik", X, X) + 3 * np.eye(m)
        L = np.asarray(_chol_small(jnp.asarray(G)))
        for a in range(12):
            Lg = np.linalg.cholesky(G[a])
            np.testing.assert_allclose(L[a], Lg, rtol=1e-10, atol=1e-10)
        Li = np.asarray(_tri_inv_small(jnp.asarray(L)))
        for a in range(12):
            np.testing.assert_allclose(Li[a] @ L[a], np.eye(m),
                                       atol=1e-9)
        Ginv = np.asarray(_spd_inv_small(jnp.asarray(G)))
        for a in range(12):
            np.testing.assert_allclose(Ginv[a] @ G[a], np.eye(m),
                                       atol=1e-8)


def test_chol_small_degenerate_zero_blocks():
    """Padded (all-zero) aggregates must invert to zero, not NaN."""
    G = jnp.zeros((3, 3, 3), dtype=jnp.float64)
    L = _chol_small(G)
    assert np.all(np.isfinite(np.asarray(L)))
    Li = _tri_inv_small(L)
    assert np.all(np.asarray(Li) == 0)


def test_block_m1_matches_scalar_device_path():
    """The m=1, bs=1 block pipeline reproduces device_sa_setup's
    hierarchy: identical residual histories to rounding."""
    g = (48, 48)
    A = poisson(g, format="csr")
    n = A.shape[0]
    b = np.random.default_rng(0).random(n)
    ds_blk = device_sa_setup_block(A, grid=g, B=np.ones((n, 1)),
                                   max_coarse=200, dtype=jnp.float64)
    ds_sca = device_sa_setup(A, grid=g, max_coarse=200,
                             dtype=jnp.float64)
    r1, r2 = [], []
    x1 = ds_blk.solve(b, tol=1e-10, maxiter=60, accel="cg", residuals=r1)
    x2 = ds_sca.solve(b, tol=1e-10, maxiter=60, accel="cg", residuals=r2)
    assert len(r1) == len(r2)
    np.testing.assert_allclose(r1, r2, rtol=1e-8)
    np.testing.assert_allclose(x1, x2, rtol=1e-7, atol=1e-12)


def test_tentative_orthonormality_invariant():
    """Per-aggregate Q^T Q == I on non-degenerate aggregates: the Gram
    of the pointwise Q values, block-summed per aggregate, must be the
    identity (fit_candidates' defining property)."""
    from pyamg_tpu.engine.block_setup import (_block_sum_ch,
                                              _fit_candidates_gram)

    g = (9, 9)
    rng = np.random.default_rng(1)
    n = int(np.prod(g))
    bs, m = 2, 3
    B = jnp.asarray(rng.standard_normal((n, bs, m)))
    Qv, Bc = _fit_candidates_gram(B, g, 3, jnp.float64)
    pairs = [(i, j) for i in range(m) for j in range(i + 1)]
    fields = jnp.stack([jnp.sum(Qv[:, :, i] * Qv[:, :, j], axis=1)
                        for (i, j) in pairs])
    gram = np.asarray(_block_sum_ch(fields, (3, 3), 3))
    for p, (i, j) in enumerate(pairs):
        expect = 1.0 if i == j else 0.0
        np.testing.assert_allclose(gram[p], expect, atol=1e-10)
    # coarse candidates reproduce the aggregate Gram: Bc^T Bc = G
    Bnp = np.asarray(B).reshape(3, 3, 3, 3, bs, m)   # (cy, sy, cx, sx, ...)
    for cy in range(3):
        for cx in range(3):
            blk = Bnp[cy, :, cx, :].reshape(-1, m)
            G = blk.T @ blk
            R = np.asarray(Bc)[cy * 3 + cx]
            np.testing.assert_allclose(R.T @ R, G, rtol=1e-9, atol=1e-9)


def test_elasticity_block_device_setup_converges():
    """BSR bs=2 elasticity with the 3 rigid-body candidates: the device
    hierarchy solves to 1e-8 (f64) with a healthy convergence factor."""
    A, B = linear_elasticity((32, 32))
    ds = device_sa_setup_block(A, grid=(32, 31), B=B, max_coarse=300,
                               dtype=jnp.float64)
    # level structure: bs=2 finest, bs=3 (=m) coarser
    bss = [getattr(l.A, "bs", None) for l in ds.hierarchy.levels]
    assert bss[0] == 2 and bss[1] == 3
    b = np.random.default_rng(3).random(A.shape[0])
    res = []
    x = ds.solve(b, tol=1e-8, maxiter=100, accel="cg", residuals=res)
    true_rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert true_rel < 1e-7
    factor = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
    assert factor < 0.5
    assert len(res) - 1 < 40


def test_scalar_multicandidate_converges():
    """Scalar operator with m=2 candidates (ones + linear) exercises the
    multi-candidate recursion (coarse levels carry bs=2 blocks)."""
    g = (48, 48)
    A = poisson(g, format="csr")
    n = A.shape[0]
    x = np.arange(n, dtype=float) % g[1]
    B = np.stack([np.ones(n), x - x.mean()], axis=1)
    ds = device_sa_setup_block(A, grid=g, B=B, max_coarse=200,
                               dtype=jnp.float64)
    assert getattr(ds.hierarchy.levels[1].A, "bs", None) == 2
    b = np.random.default_rng(0).random(n)
    res = []
    xs = ds.solve(b, tol=1e-8, maxiter=60, accel="cg", residuals=res)
    assert np.linalg.norm(b - A @ xs) / np.linalg.norm(b) < 1e-8
    factor = (res[-1] / res[0]) ** (1.0 / (len(res) - 1))
    assert factor < 0.45


def test_block_mixed_precision_true_residual():
    """f32 hierarchy + f64 outer Krylov on device: the reported history
    equals the TRUE residual (the f32-only path drifts at ~1e-4 on
    elasticity's conditioning)."""
    A, B = linear_elasticity((32, 32))
    ds = device_sa_setup_block(A, grid=(32, 31), B=B,
                               mixed_precision=True)
    b = np.random.default_rng(1).random(A.shape[0])
    res = []
    x = ds.solve(b, tol=1e-9, maxiter=100, accel="cg", residuals=res,
                 precision="mixed")
    true_rel = np.linalg.norm(b - A @ x) / np.linalg.norm(b)
    assert true_rel < 1e-8
    np.testing.assert_allclose(res[-1] / res[0], true_rel, rtol=1e-3)


def test_block_setup_rejects_bad_inputs():
    A = poisson((16, 16), format="csr")
    n = A.shape[0]
    with pytest.raises(ValueError):
        device_sa_setup_block(A, grid=(16, 16),
                              B=np.ones((n, 5)))   # m > 4
    with pytest.raises(ValueError):
        device_sa_setup_block(A, grid=(8, 8), B=np.ones((n, 1)))
