"""Interleaved (S, K, 128) lane-stack DIA kernels — the batched
multi-RHS fast path (round 5).

The K-major (K, n_pad) lane layout's per-lane strided HBM blocks cap at
~210-250 GB/s — ~2/3 of the Pallas copy ceiling — and the batched
V-cycle is traffic-bound (DESIGN.md "Batched multi-RHS solves").
Storing lane stacks INTERLEAVED as (S, K, 128) with S = n_pad/128
chunks makes every (R, K, 128) kernel block fully contiguous: each
(K, 128) tile is one 128-lane chunk of all K lanes, diagonal shifts
decompose as tile-granular chunk slices plus in-tile lane rolls
(``pltpu.roll``), and the measured kernel bandwidth reaches the copy
ceiling (scripts/probe_kmat_interleave.py: K=8 SpMV 1.50 ms vs 1.98
strided at 4.46M).

Operator data needs NO relayout: DIA ``data`` reshapes (nd, n_pad) ->
(nd, S, 128) as a free minor-preserving view, broadcast over the K
axis in-kernel.  Only the K lane VECTORS are interleaved — and the
batched cycle (engine/batched_cycle.py) keeps its state interleaved
end-to-end, so conversions happen once per solve, not per op.

Correctness at block boundaries uses the SAME invariant as the fused
K-major DIA kernels (round 3): halo chunk reads are CLAMPED at the
array edges, which is sound because out-of-range DIA slots are
structurally zero — the garbage lanes multiply by stored zeros.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend optional at import time (CPU test runs)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["to_interleaved", "from_interleaved", "int_jacobi_zero_res",
           "int_spmv", "int_spmv_scaled", "int_spmv_add",
           "int_jacobi_step"]

_LANES = 128


def to_interleaved(Xk):
    """(K, n_pad) K-major -> (S, K, 128) interleaved (n_pad % 128 == 0)."""
    K, n_pad = Xk.shape
    return jnp.moveaxis(Xk.reshape(K, n_pad // _LANES, _LANES), 0, 1)


def from_interleaved(Xi):
    """(S, K, 128) interleaved -> (K, n_pad) K-major."""
    S, K, _ = Xi.shape
    return jnp.moveaxis(Xi, 1, 0).reshape(K, S * _LANES)


def _halo_tiles(offsets):
    """Halo extent in 128-lane tiles: power of two >= max|off|/128,
    floor 8 (Mosaic sublane minimum for the f32 halo blocks)."""
    max_off = max(max(offsets), -min(offsets), 1)
    C = 8
    while C * _LANES < max_off:
        C *= 2
    return C


def _pick_block(n_pad, offsets):
    """Rows per kernel block: 32768 when it divides (R=256 tiles), else
    the largest power-of-two divisor >= 4*C*128; None disables the
    Pallas path (reference fallback)."""
    C = _halo_tiles(offsets)
    for B in (32768, 65536, 16384, 8192):
        if n_pad % B == 0 and B // _LANES >= C and B // _LANES % C == 0:
            return B
    # small arrays (CPU-test grids): a single block still fits VMEM
    if n_pad <= 65536 and (n_pad // _LANES) % C == 0 \
            and n_pad // _LANES >= C:
        return n_pad
    return None


def _shift_read(xcat, off, C, R, lane):
    """Read the (R, K, 128) slab of xcat shifted by ``off`` lanes.

    xcat is (2C + R, K, 128) = [C-tile low halo | R block | C-tile high
    halo]; off in (-C*128, C*128)."""
    q, r = divmod(C * _LANES + off, _LANES)
    if r == 0:
        return xcat[q:q + R]
    t = xcat[q:q + R + 1]
    a = pltpu.roll(t, np.int32(_LANES - r), axis=2)
    return jnp.where(lane < _LANES - r, a[:R], a[1:R + 1])


def _halo_specs(C, R, K, S):
    """(lo, center, hi) BlockSpecs for a haloed (S, K, 128) input."""
    z = np.int32(0)
    one = np.int32(1)
    Q = np.int32(R // C)
    last = np.int32(S // C - 1)
    return (
        pl.BlockSpec((C, K, _LANES),
                     lambda b: (jnp.maximum(b * Q - one, z), z, z)),
        pl.BlockSpec((R, K, _LANES), lambda b: (b, z, z)),
        pl.BlockSpec((C, K, _LANES),
                     lambda b: (jnp.minimum(b * Q + Q, last), z, z)),
    )


def _halo_specs_vec(C, R, S):
    """Same, for a per-row (S, 128) vector operand (dinv etc.)."""
    z = np.int32(0)
    one = np.int32(1)
    Q = np.int32(R // C)
    last = np.int32(S // C - 1)
    return (
        pl.BlockSpec((C, _LANES),
                     lambda b: (jnp.maximum(b * Q - one, z), z)),
        pl.BlockSpec((R, _LANES), lambda b: (b, z)),
        pl.BlockSpec((C, _LANES),
                     lambda b: (jnp.minimum(b * Q + Q, last), z)),
    )


def _center_spec(R, K):
    z = np.int32(0)
    return pl.BlockSpec((R, K, _LANES), lambda b: (b, z, z))


def _center_spec_vec(R):
    z = np.int32(0)
    return pl.BlockSpec((R, _LANES), lambda b: (b, z))


def _data_spec(nd, R):
    z = np.int32(0)
    return pl.BlockSpec((nd, R, _LANES), lambda b: (z, b, z))


def _pallas_ok(A, Xi):
    return (jax.default_backend() == "tpu" and pltpu is not None
            and Xi.dtype == jnp.float32
            and A.data.dtype == jnp.float32
            and _pick_block(A.n_pad, A.offsets) is not None)


def _apply_ref(A, Xi):
    """Reference A @ Xi on interleaved stacks (CPU tests; circular-roll
    DIA semantics, identical to the K-major rule)."""
    Xk = from_interleaved(Xi)
    Y = A.data[0][None, :] * jnp.roll(Xk, -A.offsets[0], axis=1)
    for d in range(1, len(A.offsets)):
        Y = Y + A.data[d][None, :] * jnp.roll(Xk, -A.offsets[d], axis=1)
    return to_interleaved(Y)


def _spmv_kernel(offsets, C, R, nd, mode):
    """Kernel factory.  mode:
    'zero_res'   : (b, wd, d)        -> (x, r)   x = wd*b; r = b - A x
    'scaled'     : (r, tv, d)        -> z        z = tv * (A r)
    'add'        : (t, x, d)         -> y        y = x + A t
    'jstep'      : (x, b, wd, d)     -> y        y = x + wd*(b - A x)
    (wd = omega * dinv, per-row; A = the DIA operator of ``d``)."""

    def body(xcat, d_ref, lane):
        acc = None
        for d, off in enumerate(offsets):
            sh = _shift_read(xcat, off, C, R, lane)
            term = d_ref[d][:, None, :] * sh
            acc = term if acc is None else acc + term
        return acc

    if mode == "zero_res":
        def kernel(b_lo, b_c, b_hi, wl, wc, wh, d_ref, x_ref, r_ref):
            lane = lax.broadcasted_iota(jnp.int32, (R, 1, _LANES), 2)
            bcat = jnp.concatenate([b_lo[...], b_c[...], b_hi[...]],
                                   axis=0)
            wcat = jnp.concatenate([wl[...], wc[...], wh[...]], axis=0)
            xcat = wcat[:, None, :] * bcat
            x_ref[...] = xcat[C:C + R]
            r_ref[...] = b_c[...] - body(xcat, d_ref, lane)
        return kernel
    if mode == "scaled":
        def kernel(r_lo, r_c, r_hi, tv_ref, d_ref, z_ref):
            lane = lax.broadcasted_iota(jnp.int32, (R, 1, _LANES), 2)
            rcat = jnp.concatenate([r_lo[...], r_c[...], r_hi[...]],
                                   axis=0)
            z_ref[...] = tv_ref[...][:, None, :] * body(rcat, d_ref,
                                                        lane)
        return kernel
    if mode == "plain":
        def kernel(t_lo, t_c, t_hi, d_ref, y_ref):
            lane = lax.broadcasted_iota(jnp.int32, (R, 1, _LANES), 2)
            tcat = jnp.concatenate([t_lo[...], t_c[...], t_hi[...]],
                                   axis=0)
            y_ref[...] = body(tcat, d_ref, lane)
        return kernel
    if mode == "add":
        def kernel(t_lo, t_c, t_hi, x_ref_in, d_ref, y_ref):
            lane = lax.broadcasted_iota(jnp.int32, (R, 1, _LANES), 2)
            tcat = jnp.concatenate([t_lo[...], t_c[...], t_hi[...]],
                                   axis=0)
            y_ref[...] = x_ref_in[...] + body(tcat, d_ref, lane)
        return kernel
    if mode == "jstep":
        def kernel(x_lo, x_c, x_hi, b_ref, wd_ref, d_ref, y_ref):
            lane = lax.broadcasted_iota(jnp.int32, (R, 1, _LANES), 2)
            xcat = jnp.concatenate([x_lo[...], x_c[...], x_hi[...]],
                                   axis=0)
            ax = body(xcat, d_ref, lane)
            y_ref[...] = x_c[...] + wd_ref[...][:, None, :] * (
                b_ref[...] - ax)
        return kernel
    raise ValueError(mode)


def _run(A, mode, haloed, centers, out_count=1, interpret=False):
    """Dispatch one interleaved kernel.  ``haloed`` = the ONE haloed
    (S, K, 128) or (S, 128) operand (3 specs), ``centers`` = further
    center-block operands (list of (array, is_vec))."""
    B = _pick_block(A.n_pad, A.offsets)
    S = A.n_pad // _LANES
    R = B // _LANES
    nb = S // R
    C = _halo_tiles(A.offsets)
    nd = len(A.offsets)
    data3 = A.data.reshape(nd, S, _LANES)
    arr, is_vec = haloed[0]
    K = None
    for a, v in haloed + centers:
        if a.ndim == 3:
            K = a.shape[1]
    specs = []
    operands = []
    for a, v in haloed:
        sp = _halo_specs_vec(C, R, S) if v else _halo_specs(C, R, K, S)
        specs.extend(sp)
        operands.extend([a, a, a])
    for a, v in centers:
        specs.append(_center_spec_vec(R) if v else _center_spec(R, K))
        operands.append(a)
    specs.append(_data_spec(nd, R))
    operands.append(data3)
    out_shape = jax.ShapeDtypeStruct((S, K, _LANES), jnp.float32)
    if out_count > 1:
        out_shape = [out_shape] * out_count
        out_specs = [_center_spec(R, K)] * out_count
    else:
        out_specs = _center_spec(R, K)
    kern = _spmv_kernel(A.offsets, C, R, nd, mode)
    return pl.pallas_call(
        kern, grid=(nb,), in_specs=specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*operands)


def int_jacobi_zero_res(A, wd, Bi):
    """x = wd * b (zero-guess weighted Jacobi, wd = omega*dinv per row),
    r = b - A x — fused two-output pass on interleaved stacks."""
    if not _pallas_ok(A, Bi):
        Xk = wd[None, :] * from_interleaved(Bi)
        Xi = to_interleaved(Xk)
        return Xi, Bi - _apply_ref(A, Xi)
    wd2 = wd.reshape(-1, _LANES)
    return tuple(_run(A, "zero_res", [(Bi, False), (wd2, True)], [],
                      out_count=2))


def int_spmv_scaled(A, Ri, tv):
    """z = tv * (A r) — the restrictor's tv-scaled S^T apply."""
    if not _pallas_ok(A, Ri):
        return to_interleaved(
            tv[None, :] * from_interleaved(_apply_ref(A, Ri)))
    return _run(A, "scaled", [(Ri, False)],
                [(tv.reshape(-1, _LANES), True)])


def int_spmv(A, Ti):
    """y = A t on interleaved stacks."""
    if not _pallas_ok(A, Ti):
        return _apply_ref(A, Ti)
    return _run(A, "plain", [(Ti, False)], [])


def int_spmv_add(A, Ti, Xi):
    """y = x + A t — the prolongator's smoothing apply fused with the
    correction add."""
    if not _pallas_ok(A, Ti):
        return Xi + _apply_ref(A, Ti)
    return _run(A, "add", [(Ti, False)], [(Xi, False)])


def int_jacobi_step(A, wd, Bi, Xi):
    """y = x + wd * (b - A x) — one weighted-Jacobi post-smoothing
    sweep."""
    if not _pallas_ok(A, Xi):
        return Xi + to_interleaved(
            wd[None, :] * from_interleaved(Bi - _apply_ref(A, Xi)))
    return _run(A, "jstep", [(Xi, False)],
                [(Bi, False), (wd.reshape(-1, _LANES), True)])
