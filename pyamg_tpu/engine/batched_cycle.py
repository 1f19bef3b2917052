"""Interleaved batched V-cycle — the multi-RHS fast path (round 5).

The vmapped batched cycle keeps lane stacks K-MAJOR (K, n_pad); its
finest-level kernels stream per-lane strided HBM blocks at ~2/3 of the
chip's copy bandwidth (DESIGN.md "Batched multi-RHS solves").  This
module runs the FINEST level — where the traffic is — on INTERLEAVED
(S, K, 128) stacks through the `sparse.interleaved` kernels, and the
coarse recursion through the existing vmapped cycle on K-major stacks:

    x  = ω D⁻¹ b ; r = b − A x          int_jacobi_zero_res (fused)
    z  = tv ∘ (Sᵀ r)                     int_spmv_scaled
    rc = blocksum(z)  → (K, nc)          XLA reshapes + one-hot einsum
    ec = vmapped sub-cycle on levels[1:]
    t  = tv ∘ spread(ec) → interleaved   XLA einsum (coarse-side
                                         transpose only — never a
                                         fine-sized relayout)
    x += S @ t                           int_spmv_add (fused add)
    x += ω D⁻¹ (b − A x)                 int_jacobi_step

The chain state stays interleaved END-TO-END: `to_interleaved` /
`from_interleaved` run once per solve, not per op — the conversion
cost that erased the round-3 batched gains never recurs.

Scope: 2-D lane-aligned structured hierarchies (device_sa_setup(...,
lane_align=True)) with DIA finest operator, factored structured
transfers, and single-sweep Jacobi smoothers — the flagship batched
configuration.  Anything else raises ValueError (callers fall back to
the vmapped cycle).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..sparse.dia import DIAMatrix
from ..sparse.interleaved import (from_interleaved, int_jacobi_step,
                                  int_jacobi_zero_res, int_spmv,
                                  int_spmv_add, int_spmv_scaled,
                                  to_interleaved)
from .device_setup import StructuredProlongator, StructuredRestrictor
from .hierarchy import DeviceHierarchy
from .solver import _make_cycle

__all__ = ["interleaved_batched_cg", "interleaved_zero_vcycle",
           "supports_interleaved"]

_LANES = 128


def _jacobi_wd(sm, n_pad):
    """ω·D⁻¹ for a single-sweep Jacobi DeviceSmoother (static or
    dynamic omega), or None."""
    cfg = sm.config
    if cfg[0] == "jacobi" and cfg[2] == 1:
        (dinv,) = sm.arrays
        return jnp.asarray(cfg[1], dinv.dtype) * dinv
    if cfg[0] == "jacobi_dyn" and cfg[1] == 1:
        dinv, omega = sm.arrays
        return omega * dinv
    return None


def supports_interleaved(h: DeviceHierarchy):
    """True when the finest level fits the interleaved fast path."""
    if len(h.levels) < 2:
        return False
    lvl = h.levels[0]
    if not isinstance(lvl.A, DIAMatrix):
        return False
    P, R = lvl.P, lvl.R
    if not (isinstance(P, StructuredProlongator)
            and isinstance(R, StructuredRestrictor)):
        return False
    stride = P.stride if isinstance(P.stride, tuple) else (
        (P.stride,) * len(P.fine_grid_p))
    if len(P.fine_grid_p) != 2 or stride != (3, 3):
        return False
    ny, nx = P.fine_grid_p
    if nx % (3 * _LANES) != 0 or ny % 3 != 0:
        return False        # needs a lane_align build
    if lvl.A.n_pad % _LANES != 0 or R.tv.shape[0] != lvl.A.n_pad:
        return False
    try:
        # the interleaved kernels are single-device; a row-sharded
        # hierarchy (shard_hierarchy) must keep the vmapped path, whose
        # collectives GSPMD understands
        if len(lvl.A.data.sharding.device_set) > 1:
            return False
    except Exception:
        pass
    try:
        wd0 = _jacobi_wd(lvl.pre, lvl.A.n_pad)
        wd1 = _jacobi_wd(lvl.post, lvl.A.n_pad)
    except Exception:
        return False
    return wd0 is not None and wd1 is not None


def _m3():
    """Static (3, 128, 128) one-hot: fine lane l of sub-chunk t ↔
    coarse lane m = (t·128 + l) // 3."""
    t = np.arange(3)[:, None, None]
    lf = np.arange(_LANES)[None, :, None]
    m = np.arange(_LANES)[None, None, :]
    return ((t * _LANES + lf) // 3 == m).astype(np.float32)


def _restrict_tail(Z, R: StructuredRestrictor, n1_pad):
    """blocksum(tv∘Sᵀr) + coarse grid/solve padding → (K, n1_pad)."""
    ny, nx = R.fine_grid_p
    nyc, nxc = R.coarse_grid
    cx = nx // _LANES
    cxc = nxc // _LANES
    K = Z.shape[1]
    zg = Z[: ny * cx].reshape(ny, cx, K, _LANES)
    # y-blocksum: triples of grid rows
    zy = zg.reshape(nyc, 3, cx, K, _LANES).sum(axis=1)
    # x-blocksum: lane-triple one-hot contraction (exact selection sums
    # — precision=HIGHEST per the TPU f32-einsum trap, CLAUDE.md)
    M = jnp.asarray(_m3())
    rc = jnp.einsum("yxtkl,tlm->yxkm",
                    zy.reshape(nyc, cxc, 3, K, _LANES), M,
                    precision=lax.Precision.HIGHEST)
    # (nyc, cxc, K, 128) → K-major (coarse-sized transpose only)
    rc = jnp.moveaxis(rc, 2, 0).reshape(K, nyc * nxc)
    # grid pad to coarse_grid_p, then solve pad to the next level
    cgp = R.coarse_grid_p
    rc = rc.reshape(K, nyc, nxc)
    rc = jnp.pad(rc, ((0, 0), (0, cgp[0] - nyc), (0, cgp[1] - nxc)))
    rc = rc.reshape(K, cgp[0] * cgp[1])
    if rc.shape[1] < n1_pad:
        rc = jnp.pad(rc, ((0, 0), (0, n1_pad - rc.shape[1])))
    return rc[:, :n1_pad]


def _prolong_front(ec, P: StructuredProlongator, S_tiles):
    """tv ∘ spread(unpad(ec)) as an interleaved fine stack (S, K, 128).

    The K-axis transpose happens at COARSE size; the fine-sized output
    is written directly in interleaved layout by the broadcast einsum
    (a fine-sized relayout here would eat the fast path's win)."""
    ny, nx = P.fine_grid_p
    nyc, nxc = P.coarse_grid
    cgp = P.coarse_grid_p
    cx = nx // _LANES
    cxc = nxc // _LANES
    K = ec.shape[0]
    v = ec[:, : cgp[0] * cgp[1]].reshape(K, cgp[0], cgp[1])
    v = v[:, :nyc, :nxc]
    v = v.reshape(K, nyc, cxc, _LANES)
    v = jnp.moveaxis(v, 0, 2)                    # (nyc, cxc, K, 128)
    v = jnp.repeat(v, 3, axis=0)                 # fine y rows
    M = jnp.asarray(_m3())
    t = jnp.einsum("yxkm,tlm->yxtkl", v, M,
                   precision=lax.Precision.HIGHEST)
    t = t.reshape(ny, cx, K, _LANES)
    tv_g = P.tv[: ny * nx].reshape(ny, cx, _LANES)
    t = t * tv_g[:, :, None, :]
    t = t.reshape(ny * cx, K, _LANES)
    if t.shape[0] < S_tiles:
        t = jnp.pad(t, ((0, S_tiles - t.shape[0]), (0, 0), (0, 0)))
    return t


def interleaved_zero_vcycle(h: DeviceHierarchy, Bi):
    """One zero-initial-guess V-cycle on an interleaved RHS stack
    (S, K, 128) → interleaved correction (S, K, 128).  Call
    :func:`supports_interleaved` first; raises ValueError otherwise."""
    if not supports_interleaved(h):
        raise ValueError(
            "hierarchy does not fit the interleaved fast path (needs a "
            "2-D stride-3 lane_align device_sa_setup hierarchy with "
            "DIA finest level and 1-sweep Jacobi smoothers)")
    lvl = h.levels[0]
    A = lvl.A
    P, R = lvl.P, lvl.R
    wd0 = _jacobi_wd(lvl.pre, A.n_pad)
    wd1 = _jacobi_wd(lvl.post, A.n_pad)

    X, Rr = int_jacobi_zero_res(A, wd0, Bi)
    Z = int_spmv_scaled(R.St, Rr, R.tv)
    rc = _restrict_tail(Z, R, h.levels[1].n_pad)

    h_sub = DeviceHierarchy(levels=h.levels[1:],
                            coarse_inv=h.coarse_inv, nc=h.nc,
                            nc_pad=h.nc_pad, dtype=h.dtype)
    sub = _make_cycle(len(h.levels) - 1, "V")
    ec = jax.vmap(sub.zero, in_axes=(None, 0))(h_sub, rc)

    Ti = _prolong_front(ec, P, Bi.shape[0])
    X = int_spmv_add(P.S, Ti, X)
    return int_jacobi_step(A, wd1, Bi, X)


def interleaved_batched_cg(h: DeviceHierarchy, Bk, tol=1e-5,
                           maxiter=100):
    """Preconditioned CG on K right-hand sides SIMULTANEOUSLY, with the
    interleaved V-cycle as preconditioner and every vector op on
    interleaved stacks — the end-to-end multi-RHS device solve (f32;
    the f32 true-residual floor is ~1e-6 relative).

    Per-lane scalars ((K,) dots via ``jnp.sum(·, axis=(0, 2))``) drive
    per-lane step sizes; converged lanes SELF-FREEZE (their alpha is
    zeroed) so early lanes cannot corrupt late ones — the same contract
    as the vmapped batched Krylov lanes.  Returns ``(X (K, n_pad),
    histories (maxiter+1, K))`` with NaN padding after each lane's
    convergence.

    ``Bk`` must be in the level-0 PADDED-GRID layout ((K, n_pad) with
    each lane grid-padded row-major onto fine_grid_p — tail-padding a
    flat b puts mass in the operator's structural-zero pad rows,
    outside range(A), and CG stalls; use
    ``StructuredDeviceSolver.solve`` for the layout-managing high-level
    batched API)."""
    if not supports_interleaved(h):
        raise ValueError("hierarchy does not fit the interleaved fast "
                         "path; use the vmapped batched solve")
    A = h.levels[0].A
    Bi = to_interleaved(Bk)
    K = Bi.shape[1]

    def dots(Ui, Vi):
        return jnp.sum(Ui * Vi, axis=(0, 2))

    b_norm = jnp.sqrt(dots(Bi, Bi))
    thresh = tol * jnp.maximum(b_norm, 1e-30)
    X0 = jnp.zeros_like(Bi)
    Z0 = interleaved_zero_vcycle(h, Bi)
    rz0 = dots(Bi, Z0)
    hist0 = jnp.full((maxiter + 1, K), jnp.nan, dtype=Bi.dtype)
    hist0 = hist0.at[0].set(b_norm)
    iota = jnp.arange(maxiter + 1)

    # history writes are where-over-iota and the residual norms ride
    # the carry (never a dynamic hist[it] slice in the body); the
    # convergence check runs every CHUNK=4 masked iterations — frozen-
    # lane masking makes overshoot iterations no-ops, so the coarser
    # check costs at most 3 wasted masked steps.  Measured at 2048^2
    # lane_align K=8 (dependent-sync wall): 0.165 s to 1e-5
    # (~21 ms/RHS) vs 0.25 s for the vmapped batched solve.
    CHUNK = 4

    def step(it, carry):
        X, Ri, Zi, Pi, rz, rn, hist = carry
        active = rn > thresh
        Qi = int_spmv(A, Pi)
        pq = dots(Pi, Qi)
        alpha = jnp.where(active & (pq != 0),
                          rz / jnp.where(pq != 0, pq, 1.0), 0.0)
        a3 = alpha[None, :, None]
        X = X + a3 * Pi
        Ri = Ri - a3 * Qi
        rn_new = jnp.where(active, jnp.sqrt(dots(Ri, Ri)), rn)
        hist = jnp.where((iota == it + 1)[:, None] & active[None, :],
                         rn_new[None, :], hist)
        Zi = interleaved_zero_vcycle(h, Ri)
        rz_new = dots(Ri, Zi)
        beta = jnp.where(active & (rz != 0),
                         rz_new / jnp.where(rz != 0, rz, 1.0), 0.0)
        Pi = Zi + beta[None, :, None] * Pi
        return X, Ri, Zi, Pi, rz_new, rn_new, hist

    def cond(carry):
        it, *_rest = carry
        rn = carry[6]
        return (it < maxiter) & jnp.any(rn > thresh)

    def body(carry):
        it = carry[0]
        inner = carry[1:]
        inner = lax.fori_loop(
            0, CHUNK, lambda j, c: step(it + j, c), inner)
        return (it + CHUNK,) + inner

    carry = (0, X0, Bi, Z0, Z0, rz0, b_norm, hist0)
    carry = lax.while_loop(cond, body, carry)
    X, hist = carry[1], carry[7]
    return from_interleaved(X), hist
