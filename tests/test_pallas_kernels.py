"""Interpret-mode NUMERICS for the round-2 Pallas hot-path kernels.

The TPU kernels (fused DIA SpMV / fused Jacobi, windowed one-hot v2
forward, windowed transpose apply) never trace on the CPU test backend —
these tests run their exact kernel bodies under the Pallas interpreter
so a wrong index/shift breaks the suite, not just the TPU bench
(round-1 verdict weak item 3 applied to the new kernels).
"""
import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse import pad_vector
from pyamg_tpu.sparse.dia import (_dia_pallas_matvec, dia_from_scipy,
                                  dia_pallas_jacobi)
from pyamg_tpu.sparse.window import TransposedWindowed, windowed_from_scipy


def _random_rect(n, m, per_row, spread, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), per_row)
    cols = np.clip((rows * m) // n + rng.integers(-spread, spread + 1,
                                                  len(rows)), 0, m - 1)
    vals = rng.standard_normal(len(rows))
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, m))


def test_dia_pallas_matvec_interpret():
    """Fused DIA kernel == rolled XLA form, including lane-crossing
    offsets (+-1) and sublane-aligned ones (+-gridwidth)."""
    A = poisson((64, 64), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=1024)
    x = pad_vector(jnp.asarray(
        np.random.default_rng(0).random(A.shape[0]), dtype=jnp.float32),
        D.n_pad)
    want = np.asarray(D.matvec(x))          # slice/roll reference path
    got = np.asarray(_dia_pallas_matvec(D.data, D.offsets, x, 1024,
                                        interpret=True))
    np.testing.assert_array_equal(got, want)


def test_dia_pallas_jacobi_interpret():
    """Fused Jacobi sweep == composed x + w*dinv*(b - Ax)."""
    A = poisson((64, 64), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=1024)
    rng = np.random.default_rng(1)
    x = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    b = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    want = np.asarray(x + 0.85 * (dinv * (b - D.matvec(x))))
    got = np.asarray(dia_pallas_jacobi(D, x, b, dinv, 0.85, interpret=True,
                                       force_B=1024))
    np.testing.assert_allclose(got, want, atol=2e-6)
    # device-resident omega (jacobi_dyn form)
    got_dyn = np.asarray(dia_pallas_jacobi(
        D, x, b, dinv, jnp.asarray(0.85, dtype=jnp.float32),
        interpret=True, force_B=1024))
    np.testing.assert_allclose(got_dyn, want, atol=2e-6)


def test_dia_pallas_single_rhs_chunked_halo_interpret():
    """Q>1 chunked-halo indexing and end clamping of the SINGLE-RHS
    fused kernels: force_B=8192 on a 512^2 operator gives R=64 sublane
    rows per block with C=8 halo chunks (Q=8), so the clamped lo/hi halo
    chunk reads are exercised at both array ends (the B=1024 cases above
    have C==R, Q=1; only the K-lane variants covered Q>1 — ADVICE r3)."""
    A = poisson((512, 512), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32)
    assert D.n_pad % 8192 == 0
    rng = np.random.default_rng(13)
    x = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    b = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    want = np.asarray(D.matvec(x))          # slice/roll reference path
    got = np.asarray(_dia_pallas_matvec(D.data, D.offsets, x, 8192,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    wantj = np.asarray(x + 0.85 * (dinv * (b - D.matvec(x))))
    gotj = np.asarray(dia_pallas_jacobi(D, x, b, dinv, 0.85,
                                        interpret=True, force_B=8192))
    np.testing.assert_allclose(gotj, wantj, atol=3e-6)


@pytest.mark.parametrize("block", [256, 1024, 2048])
def test_windowed_v2_forward_interpret(block):
    """v2 forward one-hot kernel == scipy, multiple row-block sizes."""
    P = _random_rect(4096, 1500, per_row=3, spread=40, seed=2)
    W = windowed_from_scipy(P, block=block)
    assert W is not None
    x = jnp.asarray(np.random.default_rng(3).random(W.m_chunks * W.w2),
                    dtype=jnp.float32)
    want = P @ np.asarray(x)[: P.shape[1]]
    got = np.asarray(W._matvec_pallas(x, interpret=True))[: P.shape[0]]
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


@pytest.mark.parametrize("K", [2, 8])
def test_windowed_fused_matmat_interpret(K):
    """Fused multi-RHS forward kernel == scipy A @ X: the (K·H, 128)
    shared-one-hot contraction and the per-lane chunk select must agree
    with the per-column reference for every lane."""
    P = _random_rect(4096, 1500, per_row=3, spread=40, seed=7)
    W = windowed_from_scipy(P, block=256)
    assert W is not None
    X = jnp.asarray(
        np.random.default_rng(8).random((W.m_chunks * W.w2, K)),
        dtype=jnp.float32)
    want = P @ np.asarray(X)[: P.shape[1]]
    got = np.asarray(W._matmat_pallas(X, interpret=True))[: P.shape[0]]
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


def test_windowed_transpose_interpret():
    """Transpose kernel (restriction path) == scipy A.T @ r, exercising
    the VMEM-resident accumulation across overlapping windows."""
    P = _random_rect(8192, 2600, per_row=4, spread=60, seed=4)
    W = windowed_from_scipy(P)          # adaptive block
    assert W is not None and W._can_transpose_pallas()
    r = jnp.asarray(np.random.default_rng(5).random(W.n_pad),
                    dtype=jnp.float32)
    want = P.T @ np.asarray(r)[: P.shape[0]]
    got = np.asarray(W._rmatvec_pallas(r, interpret=True))[: P.shape[1]]
    np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


def test_restriction_shares_prolongator():
    """compile_hierarchy compiles large SA transfers to the FACTORED form
    (ComposedOperator: DIA smoothing factor + k=1 windowed tentative),
    with R sharing P's tentative arrays through the transpose kernel, and
    the device solve matches the host solve history."""
    import pyamg_tpu
    from pyamg_tpu.engine import DeviceMultilevelSolver, compile_hierarchy
    from pyamg_tpu.sparse.composed import ComposedOperator

    A = poisson((48, 48), format="csr")
    ml = pyamg_tpu.smoothed_aggregation_solver(
        A, presmoother=("jacobi", {"omega": 4.0 / 3.0}),
        postsmoother=("jacobi", {"omega": 4.0 / 3.0}),
        max_coarse=100)
    h = compile_hierarchy(ml, dtype=jnp.float64, row_pad=8)
    big = [lvl for lvl in h.levels[:-1] if max(lvl.R.shape) > 2048]
    # every large level's transfers are factored, R sharing P's tentative
    assert all(isinstance(lvl.P, ComposedOperator)
               and isinstance(lvl.R, ComposedOperator) for lvl in big)
    assert all(
        isinstance(lvl.R.ops[0], TransposedWindowed)
        and lvl.R.ops[0].base is lvl.P.ops[-1] for lvl in big)
    assert big or all(max(l.A.shape[0], 1) <= 2048 for l in h.levels)

    dml = DeviceMultilevelSolver(h)
    b = np.random.default_rng(6).random(A.shape[0])
    res_d, res_h = [], []
    dml.solve(b, tol=1e-10, maxiter=25, accel="cg", residuals=res_d)
    ml.solve(b, tol=1e-10, maxiter=25, accel="cg", residuals=res_h)
    assert len(res_d) == len(res_h)
    np.testing.assert_allclose(res_d, res_h, rtol=1e-8)


def test_factored_transfer_parity():
    """Factored device P/R (S^d·T composed ops) == scipy P/R applies to
    f64 rounding, for degree 1 and 2 jacobi prolongation smoothing."""
    import pyamg_tpu
    from pyamg_tpu.engine import compile_hierarchy
    from pyamg_tpu.sparse.composed import ComposedOperator

    A = poisson((96, 96), format="csr")
    for degree in (1, 2):
        ml = pyamg_tpu.smoothed_aggregation_solver(
            A, smooth=("jacobi", {"degree": degree}), max_levels=2)
        Ph = ml.levels[0].P
        assert hasattr(Ph, "_sa_factor")
        fac = Ph._sa_factor
        assert fac["degree"] == degree
        # rebuild S from the recipe and check P == S^degree @ T exactly
        A0 = sp.csr_matrix(ml.levels[0].A)
        Dinv = sp.dia_matrix((fac["dinv"].reshape(1, -1), [0]),
                             shape=A0.shape)
        S = (sp.identity(A0.shape[0]) - fac["omega"] * (Dinv @ A0)).tocsr()
        T = fac["T"]
        err = abs((S @ (S @ T) if degree == 2 else S @ T) - Ph).max()
        assert err < 1e-14
        h = compile_hierarchy(ml, dtype=jnp.float64, row_pad=8)
        l0 = h.levels[0]
        assert isinstance(l0.P, ComposedOperator)
        assert len(l0.P.ops) == degree + 1
        xc = np.random.default_rng(10).random(Ph.shape[1])
        got = np.asarray(l0.P @ jnp.asarray(xc))[: Ph.shape[0]]
        np.testing.assert_allclose(got, Ph @ xc, rtol=1e-13, atol=1e-13)
        r = np.random.default_rng(11).random(Ph.shape[0])
        got_r = np.asarray(l0.R @ pad_vector(jnp.asarray(r),
                                             l0.n_pad))[: Ph.shape[1]]
        np.testing.assert_allclose(got_r, ml.levels[0].R @ r,
                                   rtol=1e-13, atol=1e-13)


def test_nonsymmetric_restriction_transposed_windowed():
    """When R != P^T (nonsymmetric SA), R still routes through
    windowed(R^T) transpose-apply and matches scipy."""
    from pyamg_tpu.engine.hierarchy import _restriction_operator, \
        _transfer_operator

    P = _random_rect(6144, 2100, per_row=3, spread=30, seed=7)
    R = _random_rect(2100, 6144, per_row=5, spread=90, seed=8).T.T
    P_dev = _transfer_operator(P, jnp.float64, 8)
    R_dev = _restriction_operator(sp.csr_matrix(R), P, P_dev, jnp.float64, 8)
    assert isinstance(R_dev, TransposedWindowed)
    r = np.random.default_rng(9).random(6144)
    got = np.asarray(R_dev @ pad_vector(jnp.asarray(r),
                                        R_dev.base.n_pad))[:2100]
    np.testing.assert_allclose(got, R @ r, atol=1e-10)


@pytest.mark.parametrize("K", [2, 8])
def test_dia_fused_matmat_interpret(K):
    """Fused multi-RHS DIA kernel == rolled XLA matmat: K lane blocks
    share one diagonal-data read per grid step."""
    import scipy.sparse as sp

    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.sparse import dia_from_scipy
    from pyamg_tpu.sparse.dia import _dia_pallas_matmat

    A = poisson((512, 512), format="csr")
    D = dia_from_scipy(sp.csr_matrix(A), dtype=jnp.float32)
    X = jnp.asarray(np.random.default_rng(0).random((D.n_pad, K)),
                    dtype=jnp.float32)
    want = sum(np.asarray(D.data[d])[:, None]
               * np.roll(np.asarray(X), -D.offsets[d], axis=0)
               for d in range(D.ndiags))
    got = np.asarray(_dia_pallas_matmat(D.data, D.offsets, X, 8192,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=3e-6, atol=1e-6)


def test_dia_fused_jacobi_k_interpret():
    """Fused K-lane Jacobi sweep == composed X + w*dinv*(B - A@X)."""
    import scipy.sparse as sp

    from pyamg_tpu.gallery import poisson
    from pyamg_tpu.sparse import dia_from_scipy
    from pyamg_tpu.sparse.dia import dia_pallas_jacobi_k

    A = poisson((512, 512), format="csr")
    D = dia_from_scipy(sp.csr_matrix(A), dtype=jnp.float32)
    rng = np.random.default_rng(2)
    K = 4
    X = jnp.asarray(rng.random((D.n_pad, K)), dtype=jnp.float32)
    B = jnp.asarray(rng.random((D.n_pad, K)), dtype=jnp.float32)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    want = np.asarray(X) + 0.8 * (np.asarray(dinv)[:, None] * (
        np.asarray(B) - np.asarray(D.matmat(X))))
    got = np.asarray(dia_pallas_jacobi_k(D, X, B, dinv, 0.8,
                                         interpret=True, force_B=8192))
    np.testing.assert_allclose(got, want, atol=3e-6)


@pytest.mark.parametrize("K", [2, 8])
def test_windowed_fused_rmatmat_interpret(K):
    """Fused K-lane transpose kernel == scipy A.T @ X: all K transposed
    outputs accumulate in VMEM across overlapping windows."""
    P = _random_rect(4096, 1500, per_row=3, spread=40, seed=11)
    W = windowed_from_scipy(P, block=256)
    assert W is not None
    X = jnp.asarray(np.random.default_rng(12).random((W.n_pad, K)),
                    dtype=jnp.float32)
    want = P.T @ np.asarray(X)[: P.shape[0]]
    got = np.asarray(W._rmatmat_pallas(X, interpret=True))[: P.shape[1]]
    np.testing.assert_allclose(got, want, rtol=3e-6, atol=1e-6)


def test_windowed_select_interpret():
    """Per-slot window selection kernel (unstructured setup's graph-pass
    primitive): out[b, s, r] == x[column(b, s, r)] exactly, including
    f32-encoded integer payloads (coarse indices ride through it)."""
    P = _random_rect(4096, 4096, per_row=5, spread=70, seed=21)
    W = windowed_from_scipy(P, block=256)
    assert W is not None
    rng = np.random.default_rng(22)
    # integer payloads < 2^24 must come back bit-exact
    x = jnp.asarray(rng.integers(0, 2 ** 23, W.m_chunks * W.w2),
                    dtype=jnp.float32)
    got = np.asarray(W._select_pallas(x, interpret=True))
    gidx = (np.asarray(W.starts)[:, None, None] * W.w2
            + np.asarray(W.idx))
    want = np.asarray(x)[gidx]
    np.testing.assert_array_equal(got, want)


def test_windowed_select_interpret_f32_payloads():
    """Arbitrary FINITE f32 payloads come back within the Dekker split's
    2^-26 relative tail (exact for the integer payloads above).  The
    kernel contract excludes non-finite payloads — callers use finite
    sentinels (engine/unstructured_setup._stage_roots)."""
    P = _random_rect(4096, 4096, per_row=5, spread=70, seed=23)
    W = windowed_from_scipy(P, block=256)
    rng = np.random.default_rng(24)
    x = jnp.asarray(rng.standard_normal(W.m_chunks * W.w2) * 1e3,
                    dtype=jnp.float32)
    got = np.asarray(W._select_pallas(x, interpret=True))
    gidx = (np.asarray(W.starts)[:, None, None] * W.w2
            + np.asarray(W.idx))
    want = np.asarray(x)[gidx]
    np.testing.assert_allclose(got, want, rtol=2e-7, atol=0)


def test_dia_epilogue_fused_matvec_interpret():
    """scale/add epilogues of the fused DIA SpMV == composed forms
    (round-4 transfer fusions: restrictor tv-scale, prolongator
    correction-add)."""
    from pyamg_tpu.sparse.dia import _dia_pallas_matvec
    A = poisson((64, 64), format="csr")
    D = dia_from_scipy(A, row_pad=128)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.standard_normal(D.n_pad), dtype=jnp.float32)
    s = jnp.asarray(rng.standard_normal(D.n_pad), dtype=jnp.float32)
    c = jnp.asarray(rng.standard_normal(D.n_pad), dtype=jnp.float32)
    B = 1024
    base = np.asarray(_dia_pallas_matvec(D.data, D.offsets, x, B,
                                         interpret=True))
    got_s = np.asarray(_dia_pallas_matvec(D.data, D.offsets, x, B,
                                          scale=s, interpret=True))
    np.testing.assert_allclose(got_s, base * np.asarray(s), rtol=1e-6)
    got_a = np.asarray(_dia_pallas_matvec(D.data, D.offsets, x, B,
                                          addv=c, interpret=True))
    np.testing.assert_allclose(got_a, base + np.asarray(c), rtol=1e-6,
                               atol=1e-6)
    got_sa = np.asarray(_dia_pallas_matvec(D.data, D.offsets, x, B,
                                           scale=s, addv=c,
                                           interpret=True))
    np.testing.assert_allclose(got_sa, base * np.asarray(s)
                               + np.asarray(c), rtol=1e-6, atol=1e-6)


def test_dia_jacobi_zero_res_interpret():
    """Fused zero-guess Jacobi + residual kernel == composed
    (x, r) = (w*dinv*b, b - A@x), with Q>1 chunked halos exercised
    (force_B=8192 on a 512^2 operator -> C=8, Q=8)."""
    from pyamg_tpu.sparse.dia import dia_pallas_jacobi_zero_res

    A = poisson((512, 512), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=32768)
    rng = np.random.default_rng(7)
    b = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    x_want = np.asarray(0.85 * (dinv * b))
    r_want = np.asarray(b - D.matvec(jnp.asarray(x_want)))
    x_got, r_got = dia_pallas_jacobi_zero_res(
        D, b, dinv, 0.85, interpret=True, force_B=8192)
    np.testing.assert_allclose(np.asarray(x_got), x_want, atol=2e-6)
    np.testing.assert_allclose(np.asarray(r_got), r_want, atol=2e-5)
    # device-resident omega (jacobi_dyn form)
    x_dyn, r_dyn = dia_pallas_jacobi_zero_res(
        D, b, dinv, jnp.asarray(0.85, dtype=jnp.float32), interpret=True,
        force_B=8192)
    np.testing.assert_allclose(np.asarray(x_dyn), x_want, atol=2e-6)
    np.testing.assert_allclose(np.asarray(r_dyn), r_want, atol=2e-5)


def test_zero_call_residual_smoother_path():
    """DeviceSmoother.zero_call_residual matches the composed
    zero_call + residual on the CPU fallback path, and the batched
    (vmap) rule routes through the K-major matmat."""
    import jax

    from pyamg_tpu.engine import relaxation as rx

    A = poisson((32, 32), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=128)
    rng = np.random.default_rng(3)
    b = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    sm = rx.jacobi(dinv, 0.85, iterations=1)
    out = sm.zero_call_residual(D, b)
    assert out is not None
    x, r = out
    x_want = sm.zero_call(D, b)
    r_want = b - (D @ x_want)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_want),
                               atol=1e-5)
    # multi-sweep smoothers decline the fusion (caller composes)
    assert rx.jacobi(dinv, 0.85, iterations=2).zero_call_residual(
        D, b) is None

    # batched: vmap over b lanes == per-lane composed results
    Bk = jnp.stack([b, 2.0 * b, -b])
    xk, rk = jax.vmap(lambda bb: sm.zero_call_residual(D, bb))(Bk)
    for k in range(3):
        xw = sm.zero_call(D, Bk[k])
        np.testing.assert_allclose(np.asarray(xk[k]), np.asarray(xw),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rk[k]),
                                   np.asarray(Bk[k] - (D @ xw)),
                                   atol=1e-5)


def test_dia_jacobi_res_interpret():
    """Fused nonzero-entry Jacobi sweep + residual kernel == composed
    (y, r) = (x + w*dinv*(b - A@x), b - A@y), with the double-halo
    (2C) stage-1 extension exercised at both array ends."""
    from pyamg_tpu.sparse.dia import dia_pallas_jacobi_res

    A = poisson((512, 512), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=32768)
    rng = np.random.default_rng(11)
    x = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    b = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    y_want = np.asarray(x + 0.85 * (dinv * (b - D.matvec(x))))
    r_want = np.asarray(b - D.matvec(jnp.asarray(y_want)))
    out = dia_pallas_jacobi_res(D, x, b, dinv, 0.85, interpret=True,
                                force_B=8192)
    assert out is not None
    y_got, r_got = out
    np.testing.assert_allclose(np.asarray(y_got), y_want, atol=2e-6)
    np.testing.assert_allclose(np.asarray(r_got), r_want, atol=2e-5)


def test_call_residual_smoother_path():
    """DeviceSmoother.call_residual matches composed sweep + residual on
    the CPU fallback path and under vmap."""
    import jax

    from pyamg_tpu.engine import relaxation as rx

    A = poisson((32, 32), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=128)
    rng = np.random.default_rng(5)
    x = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    b = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    sm = rx.jacobi(dinv, 0.85, iterations=1)
    out = sm.call_residual(D, x, b)
    assert out is not None
    y, r = out
    y_want = sm(D, x, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(b - (D @ y_want)), atol=1e-5)

    Xk = jnp.stack([x, -x, 0.0 * x])
    Bk = jnp.stack([b, 2.0 * b, b])
    yk, rk = jax.vmap(lambda xx, bb: sm.call_residual(D, xx, bb))(Xk, Bk)
    for k in range(3):
        yw = sm(D, Xk[k], Bk[k])
        np.testing.assert_allclose(np.asarray(yk[k]), np.asarray(yw),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(rk[k]),
                                   np.asarray(Bk[k] - (D @ yw)),
                                   atol=1e-5)


def test_dia_fused_matmat_k_epilogues_interpret():
    """K-major matmat epilogues: scale (shared (n,) factor) and addk
    (per-lane (K, n) add) == composed forms."""
    from pyamg_tpu.sparse.dia import _dia_pallas_matmat_k

    A = poisson((64, 64), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=1024)
    rng = np.random.default_rng(13)
    K = 4
    Xk = jnp.asarray(rng.random((K, D.n_pad)), dtype=jnp.float32)
    s = jnp.asarray(rng.random(D.n_pad), dtype=jnp.float32)
    Zk = jnp.asarray(rng.random((K, D.n_pad)), dtype=jnp.float32)
    base = np.stack([np.asarray(D.matvec(Xk[k])) for k in range(K)])
    got_s = np.asarray(_dia_pallas_matmat_k(
        D.data, D.offsets, Xk, 1024, scale=s, interpret=True))
    np.testing.assert_allclose(got_s, base * np.asarray(s)[None, :],
                               atol=2e-6)
    got_a = np.asarray(_dia_pallas_matmat_k(
        D.data, D.offsets, Xk, 1024, addk=Zk, interpret=True))
    np.testing.assert_allclose(got_a, base + np.asarray(Zk), atol=2e-6)


def test_dia_jacobi_zero_res_km_interpret():
    """K-lane fused zero-guess Jacobi + residual == composed per-lane
    (x, r) = (w*dinv*b, b - A@x)."""
    from pyamg_tpu.sparse.dia import dia_pallas_jacobi_zero_res_km

    A = poisson((64, 64), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=1024)
    rng = np.random.default_rng(17)
    K = 4
    Bk = jnp.asarray(rng.random((K, D.n_pad)), dtype=jnp.float32)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    out = dia_pallas_jacobi_zero_res_km(D, Bk, dinv, 0.85,
                                        interpret=True, force_B=1024)
    assert out is not None
    Xg, Rg = out
    for k in range(K):
        xw = np.asarray(0.85 * (dinv * Bk[k]))
        np.testing.assert_allclose(np.asarray(Xg[k]), xw, atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(Rg[k]),
            np.asarray(Bk[k] - D.matvec(jnp.asarray(xw))), atol=2e-5)


def test_dia_zero_chain_interpret():
    """Fused zero-entry chain kernel (x, y) == composed
    (w*dinv*b, tv * (St @ (b - A@x))), double-halo stage-1 exercised
    at both array ends."""
    from pyamg_tpu.sparse.dia import dia_pallas_zero_chain

    A = poisson((512, 512), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=32768)
    # St: a different 5-diag operator on the same pattern (the
    # smoothing-factor transpose in the real pipeline)
    St = dia_from_scipy(
        (0.1 * A + 0.9 * sp.eye(A.shape[0], format="csr")).tocsr(),
        dtype=jnp.float32, row_pad=32768)
    rng = np.random.default_rng(23)
    b = pad_vector(jnp.asarray(rng.random(A.shape[0]), dtype=jnp.float32),
                   D.n_pad)
    tv = pad_vector(jnp.asarray(rng.random(A.shape[0]),
                                dtype=jnp.float32), D.n_pad)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    x_want = np.asarray(0.85 * (dinv * b))
    r = b - D.matvec(jnp.asarray(x_want))
    y_want = np.asarray(tv * St.matvec(r))
    out = dia_pallas_zero_chain(D, St, b, dinv, tv, 0.85,
                                interpret=True, force_B=8192)
    assert out is not None
    x_got, y_got = out
    np.testing.assert_allclose(np.asarray(x_got), x_want, atol=2e-6)
    np.testing.assert_allclose(np.asarray(y_got), y_want, atol=2e-5)


def test_zero_chain_cycle_equivalence():
    """The fused zero-entry front-end leaves device-built V-cycle
    results unchanged (CPU: composed fallback path through the same
    wiring) and the batched rule matches per-lane results."""
    import jax

    from pyamg_tpu.engine import device_sa_setup
    from pyamg_tpu.engine.solver import (_fused_zero_entry_chain,
                                         _make_cycle)
    from pyamg_tpu.sparse import dia_from_stencil

    S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
    Ad = dia_from_stencil(S1, (48, 48), dtype=jnp.float32)
    dsa = device_sa_setup(Ad, grid=(48, 48), dtype=jnp.float32,
                          max_coarse=100)
    h = dsa.hierarchy
    lvl = h.levels[0]
    b = jnp.asarray(np.random.default_rng(3).random(lvl.n_pad),
                    dtype=jnp.float32)
    out = _fused_zero_entry_chain(lvl, b)
    assert out is not None, "chain gate should engage on the SA level"
    x, rc = out
    x_want = lvl.pre.zero_call(lvl.A, b)
    rc_want = lvl.R @ (b - (lvl.A @ x_want))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rc), np.asarray(rc_want),
                               rtol=1e-4, atol=1e-4)

    # batched: vmapped cycle == per-lane single cycles
    oc = _make_cycle(len(h.levels), "V")
    Bk = jnp.stack([b, 2.0 * b, -0.5 * b])
    yk = jax.vmap(lambda v: oc.zero(h, v))(Bk)
    for k in range(3):
        yw = oc.zero(h, Bk[k])
        np.testing.assert_allclose(np.asarray(yk[k]), np.asarray(yw),
                                   rtol=1e-4, atol=1e-4)


def test_dia_zero_chain_km_interpret():
    """K-lane fused zero-entry chain == composed per-lane
    (x, y) = (w*dinv*b, tv * (St @ (b - A@x)))."""
    from pyamg_tpu.sparse.dia import dia_pallas_zero_chain_km

    A = poisson((128, 128), format="csr")
    D = dia_from_scipy(A, dtype=jnp.float32, row_pad=4096)
    St = dia_from_scipy(
        (0.1 * A + 0.9 * sp.eye(A.shape[0], format="csr")).tocsr(),
        dtype=jnp.float32, row_pad=4096)
    rng = np.random.default_rng(29)
    K = 4
    Bk = jnp.asarray(rng.random((K, D.n_pad)), dtype=jnp.float32)
    tv = pad_vector(jnp.asarray(rng.random(A.shape[0]),
                                dtype=jnp.float32), D.n_pad)
    dinv = jnp.where(D.diagonal() != 0, 1.0 / D.diagonal(), 0.0)
    out = dia_pallas_zero_chain_km(D, St, Bk, dinv, tv, 0.85,
                                   interpret=True, force_B=4096)
    assert out is not None
    Xg, Yg = out
    for k in range(K):
        xw = np.asarray(0.85 * (dinv * Bk[k]))
        r = Bk[k] - D.matvec(jnp.asarray(xw))
        yw = np.asarray(tv * St.matvec(r))
        np.testing.assert_allclose(np.asarray(Xg[k]), xw, atol=2e-6)
        np.testing.assert_allclose(np.asarray(Yg[k]), yw, atol=2e-5)
