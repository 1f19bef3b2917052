"""DIA (diagonal) device format — the TPU-preferred SpMV layout.

Measured on this TPU (v5e via axon): XLA's general gather runs at
~7.7 ns/element, which caps gather-based ELL SpMV at ~0.13 Gnnz/s —
three orders of magnitude off HBM speed-of-light.  AMG operators on
lexicographically-ordered grids are *banded*: storing them by diagonal
turns SpMV into a sum of rolled elementwise multiplies

    y = sum_d  data[d, :] * roll(x, -offset[d])

with zero gathers: roll with a static shift compiles to two slices + a
concat, the whole sum fuses into one VPU pass, and throughput is bounded
by HBM bandwidth over the DIA data (ndiags * n * 4 bytes).  DIA beats
gather whenever fill = nnz/(ndiags*n) > ~0.001 — i.e. essentially always
for reordered AMG operators.

This replaces the reference's CSR SpMV (scipy csr_matvec, SURVEY.md §2.4
L0) on the TPU hot path; cf. BASELINE.json:5 "CSR/BSR kernel layer ->
Pallas": the Pallas fused variants build on this same layout.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pallas TPU backend is optional at import time (CPU test runs)
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .formats import pad_to

__all__ = ["DIAMatrix", "dia_from_scipy", "dia_from_stencil",
           "DenseOperator", "dense_from_scipy"]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DIAMatrix:
    """Diagonal-stored sparse matrix over padded vectors.

    data[d, i] = A[i, i + offsets[d]] (zero where no entry / out of
    range), so padded rows and wrap-around positions contribute exactly
    zero — vectors stay clean without masks.
    """

    data: jnp.ndarray            # (ndiags, n_pad)
    offsets: Tuple[int, ...]     # static
    shape: Tuple[int, int]       # logical
    nnz: int

    def tree_flatten(self):
        return (self.data,), (self.offsets, self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        offsets, shape, nnz = aux
        return cls(data=data, offsets=offsets, shape=shape, nnz=nnz)

    @property
    def n_pad(self):
        return self.data.shape[1]

    @property
    def ndiags(self):
        return len(self.offsets)

    @property
    def dtype(self):
        return self.data.dtype

    def matvec(self, x):
        """y = A @ x (1-D padded x).  Routed through a custom_vmap entry:
        under jax.vmap (the engine's batched multi-RHS solves) the batch
        rule applies ``matmat`` on the column stack instead of tracing
        the Pallas kernel with a batching transform it does not have."""
        return _dia_matvec_cv(self, x)

    def _matvec_impl(self, x):
        B = _fused_block(self.data, self.offsets, x)
        if B is not None:
            return _dia_pallas_matvec(self.data, self.offsets, x, B)
        # XLA fallback: static slices of one zero-padded buffer.  Measured
        # (round 2, 4.2M 5-diag f32): 1.03 ms vs 1.16 ms for the
        # roll (slice+concat) form — pads fuse better than concats.
        # Exactly equal to the roll form: out-of-range DIA slots store
        # zero, so wrap-around (roll) and zero-pad (slice) agree.
        h = max(max(self.offsets), -min(self.offsets), 0)
        xp = jnp.pad(x, (h, h))
        n_pad = self.n_pad
        y = self.data[0] * lax.slice_in_dim(
            xp, h + self.offsets[0], h + self.offsets[0] + n_pad)
        for d in range(1, len(self.offsets)):
            off = self.offsets[d]
            y = y + self.data[d] * lax.slice_in_dim(
                xp, h + off, h + off + n_pad)
        return y

    def matmat(self, X):
        """Y = A @ X for a column stack (n_pad, K).

        On TPU with small K the fused multi-RHS kernel streams x-blocks
        and the diagonal data from HBM once for all K lanes (the rolled
        XLA form re-reads X once per diagonal: traffic ~nd·(1+K)·n vs
        the kernel's ~(nd+3K)·n).  Falls back to the rolled form
        elsewhere (CPU, f64/complex, K large, bands too wide)."""
        K = X.shape[1]
        if 2 <= K <= 16:
            B = _fused_block_k(self.data, self.offsets, X, K)
            if B is not None:
                return _dia_pallas_matmat_k(
                    self.data, self.offsets, X.T, B).T
        Y = self.data[0][:, None] * jnp.roll(X, -self.offsets[0], axis=0)
        for d in range(1, len(self.offsets)):
            Y = Y + self.data[d][:, None] * jnp.roll(X, -self.offsets[d], axis=0)
        return Y

    def matmat_k(self, Xk):
        """Y = A @ X for K-MAJOR lane stacks Xk (K, n_pad) -> (K, n_pad).

        The layout the batched (vmapped) solves already carry: the fused
        kernel reads lane-major blocks natively, so this path has ZERO
        transposes — the round-3 batched V-cycle lost its amortization
        to a (K,n)->(n,K) relayout per apply plus the kernel's internal
        transpose straight back (measured round 4: stage amort 0.87x)."""
        K = Xk.shape[0]
        if 2 <= K <= 16:
            B = _fused_block_k(self.data, self.offsets, Xk.T, K)
            if B is not None:
                return _dia_pallas_matmat_k(self.data, self.offsets,
                                            Xk, B)
        Y = self.data[0][None, :] * jnp.roll(Xk, -self.offsets[0], axis=1)
        for d in range(1, len(self.offsets)):
            Y = Y + self.data[d][None, :] * jnp.roll(
                Xk, -self.offsets[d], axis=1)
        return Y

    def rmatmat_k(self, Xk):
        """A.T @ X for K-major lane stacks (K, n_pad) -> (K, n_pad)."""
        Y = jnp.roll(self.data[0][None, :] * Xk, self.offsets[0], axis=1)
        for d in range(1, len(self.offsets)):
            Y = Y + jnp.roll(self.data[d][None, :] * Xk,
                             self.offsets[d], axis=1)
        return Y

    def rmatvec(self, x):
        """Transpose apply A.T @ x, still gather-free.

        data[d, i] = A[i, i+off[d]] contributes A[i,j]*x[i] to y[j] with
        j = i + off[d], i.e. y = sum_d roll(data[d] * x, +off[d]); padded
        and out-of-range slots hold zero, so wrap-around terms vanish.
        Powers the device NE/NR (Kaczmarz/Cimmino-form) smoothers.
        Batched (vmap) calls route to :meth:`rmatmat`.
        """
        return _dia_rmatvec_cv(self, x)

    def _rmatvec_impl(self, x):
        y = jnp.roll(self.data[0] * x, self.offsets[0])
        for d in range(1, len(self.offsets)):
            y = y + jnp.roll(self.data[d] * x, self.offsets[d])
        return y

    def rmatmat(self, X):
        """A.T @ X for a column stack (n_pad, K) — rmatvec broadcast over
        the trailing RHS axis."""
        Y = jnp.roll(self.data[0][:, None] * X, self.offsets[0], axis=0)
        for d in range(1, len(self.offsets)):
            Y = Y + jnp.roll(self.data[d][:, None] * X, self.offsets[d],
                             axis=0)
        return Y

    def __matmul__(self, x):
        if x.ndim == 1:
            return self.matvec(x)
        return self.matmat(x)

    def diagonal(self):
        if 0 in self.offsets:
            return self.data[self.offsets.index(0)]
        return jnp.zeros(self.n_pad, dtype=self.dtype)


# ---------------------------------------------------------------------------
# custom_vmap entry points: batched multi-RHS solves vmap the whole solve
# program over the RHS axis; these rules reroute the per-lane SpMV to the
# 2-D matmat/rmatmat forms (rolled, gather-free) so the Pallas kernels —
# which have no batching rule — are never traced under vmap, and the
# batched work runs as one fused pass over (n_pad, K) instead of K
# separate programs.
# ---------------------------------------------------------------------------

def _cv_unbatched_operator(in_batched_A, name):
    if any(jax.tree_util.tree_leaves(in_batched_A)):
        raise NotImplementedError(
            f"vmap over the {name} operator itself is not supported; "
            "only the vector operand may be batched")


@jax.custom_batching.custom_vmap
def _dia_matvec_cv(A, x):
    return A._matvec_impl(x)


@_dia_matvec_cv.def_vmap
def _dia_matvec_rule(axis_size, in_batched, A, x):
    del axis_size
    A_b, x_b = in_batched
    _cv_unbatched_operator(A_b, "DIA")
    assert x_b, "rule invoked with no batched operand"
    # the batch axis leads (K, n_pad) — exactly the K-major kernel
    # layout, so no moveaxis/transpose anywhere (round-4 item 3)
    return A.matmat_k(x), True


@jax.custom_batching.custom_vmap
def _dia_rmatvec_cv(A, x):
    return A._rmatvec_impl(x)


@_dia_rmatvec_cv.def_vmap
def _dia_rmatvec_rule(axis_size, in_batched, A, x):
    del axis_size
    A_b, x_b = in_batched
    _cv_unbatched_operator(A_b, "DIA")
    assert x_b, "rule invoked with no batched operand"
    return A.rmatmat_k(x), True


# ---------------------------------------------------------------------------
# fused Pallas DIA kernels (the TPU hot path; BASELINE.json:5 "CSR/BSR
# kernel layer -> Pallas")
# ---------------------------------------------------------------------------
#
# One HBM pass: stream B-element blocks of x (plus one halo block each
# side) and all diagonals through VMEM; per diagonal the shifted read is
# a static sublane slice plus (for off % 128 != 0) one lane roll and a
# two-view select — no gathers, no roll temps.  Measured (round 2,
# 2048^2 5-pt f32): 0.39 ms vs 1.16 ms rolled XLA = HBM speed of light
# (~305 GB/s over data + x + y).  The fused Jacobi variant folds
# x + omega*dinv*(b - A x) into the same pass (0.42 ms vs 1.18 ms).

def _fused_block(data, offsets, x):
    """Pick the Pallas block size B, or None -> XLA fallback."""
    if pltpu is None or jax.default_backend() != "tpu":
        return None
    if x.ndim != 1:
        return None
    # Mosaic supports f32/bf16 vectors only — f64 (mixed-precision outer
    # loop) and complex stay on the XLA slice path
    ok = (jnp.float32, jnp.bfloat16)
    if jnp.dtype(data.dtype) not in ok or jnp.dtype(x.dtype) not in ok:
        return None
    n_pad = data.shape[1]
    if n_pad % 128 != 0 or x.shape[0] != n_pad or n_pad < 65536:
        return None
    nd = data.shape[0]
    max_off = max(max(offsets), -min(offsets), 1)
    min_R = 16 if jnp.bfloat16 in (data.dtype, x.dtype) else 8
    for B in (65536, 32768, 16384, 8192, 4096, 2048, 1024):
        if (n_pad % B == 0 and B >= max_off and B >= 128 * min_R
                and (nd + 6) * B * 4 <= 10 * 2**20
                and n_pad // B <= 1024):
            return B
    return None


def _dia_shifted(xcat, off, base, R, lane):
    """Shifted view xcat_flat[base + off + i] for i in [0, B) as (R, 128).
    ``base`` = element offset of the main block inside the halo-extended
    xcat (= C*128 for chunked halos, B for full-block halos)."""
    q, r = divmod(base + off, 128)
    if r == 0:
        return xcat[q:q + R]
    t = xcat[q:q + R + 1]
    a = pltpu.roll(t, np.int32(128 - r), axis=1)  # i32: x64 would make i64
    return jnp.where(lane < 128 - r, a[:R], a[1:R + 1])


def _halo_chunks(offsets, R, min_rows=8):
    """Halo chunk sublane-rows C: smallest power of two >= min_rows (8
    for the f32 Mosaic tile, 16 for bf16) with C*128 >= max|offset|,
    capped at R.

    Round-3 traffic fix: the fused kernels used to zero-pad x by a FULL
    block each side and stream three full x blocks per grid step — 3x
    the x reads plus a whole-array pad materialization (~2n more).  The
    halo only ever needs max|offset| elements, and the out-of-range DIA
    slots are structurally ZERO (the same invariant the circular-roll
    XLA path relies on), so the off-end halo chunks can simply CLAMP to
    a valid chunk: whatever garbage they read multiplies zero data.
    """
    max_off = max(max(offsets), -min(offsets), 1)
    C = max(int(min_rows), 8)
    while C * 128 < max_off:
        C *= 2
    return min(C, R)


def _fused_block_k(data, offsets, X, K):
    """Block size for the fused multi-RHS DIA kernel, or None.

    Same ladder as _fused_block with the VMEM budget scaled for K
    resident x/y lane blocks (3 double-buffered x specs + the output)."""
    if pltpu is None or jax.default_backend() != "tpu":
        return None
    if X.ndim != 2:
        return None
    ok = (jnp.float32, jnp.bfloat16)
    if jnp.dtype(data.dtype) not in ok or jnp.dtype(X.dtype) not in ok:
        return None
    n_pad = data.shape[1]
    if n_pad % 128 != 0 or X.shape[0] != n_pad or n_pad < 65536:
        return None
    nd = data.shape[0]
    max_off = max(max(offsets), -min(offsets), 1)
    min_R = 16 if jnp.bfloat16 in (data.dtype, X.dtype) else 8
    for B in (65536, 32768, 16384, 8192, 4096, 2048, 1024):
        if (n_pad % B == 0 and B >= max_off and B >= 128 * min_R
                and (nd + 8 * K + 2) * B * 4 <= 10 * 2**20
                and n_pad // B <= 1024):
            return B
    return None


def _dia_shifted_k(xcat, off, base, R, lane):
    """Per-lane shifted view of (K, R+2C, 128) halo-extended x blocks —
    _dia_shifted with a leading lane axis (same shift every lane)."""
    q, r = divmod(base + off, 128)
    if r == 0:
        return xcat[:, q:q + R]
    t = xcat[:, q:q + R + 1]
    a = pltpu.roll(t, np.int32(128 - r), axis=2)
    return jnp.where(lane < 128 - r, a[:, :R], a[:, 1:R + 1])


def _dia_pallas_matmat(data, offsets, X, B, interpret=False):
    """Column-stack (n_pad, K) wrapper over the K-major fused kernel."""
    return _dia_pallas_matmat_k(data, offsets, X.T, B,
                                interpret=interpret).T


def _dia_pallas_matmat_k(data, offsets, Xk, B, interpret=False,
                         scale=None, addk=None):
    """Fused multi-RHS DIA SpMV: the _dia_pallas_matvec geometry with K
    lane blocks resident per grid step; the diagonal data is read once
    per block for ALL lanes.  K-MAJOR in and out ((K, n_pad) lanes —
    the batched-solve layout; no transposes anywhere on this path).

    Optional CENTER-BLOCK epilogues (round 4, VERDICT item 3):
    ``scale`` (n_pad,) -> Y = scale * (A@X) (the restrictor's shared tv
    factor, one (R, 128) block broadcast over lanes); ``addk``
    (K, n_pad) -> Y = addk + A@X (the prolongator's per-lane correction
    add).  At K=8 a separate elementwise pass over a (K, n) stack costs
    ~0.9 ms at 4.2M — 8x the single-RHS epilogue saving."""
    nd, n_pad = data.shape
    K = Xk.shape[0]
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R,
                     16 if jnp.bfloat16 in (data.dtype, Xk.dtype) else 8)
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, Xk.dtype)
    x3 = Xk.reshape(K, -1, 128)     # NO pad: halos clamp (_halo_chunks)
    data3 = data.reshape(nd, n_pad // 128, 128)
    extras = []
    if scale is not None:
        extras.append((scale.reshape(-1, 128), False))
    if addk is not None:
        extras.append((addk.reshape(K, -1, 128), True))
    has_scale = scale is not None
    has_add = addk is not None

    def kernel(xlo_ref, xc_ref, xhi_ref, d_ref, *rest):
        e_refs = rest[:-1]
        y_ref = rest[-1]
        xcat = jnp.concatenate(
            [xlo_ref[...], xc_ref[...], xhi_ref[...]],
            axis=1)                                      # (K, R+2C, 128)
        lane = lax.broadcasted_iota(jnp.int32, (1, R, 128), 2)
        acc = jnp.zeros((K, R, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted_k(xcat, off, C * 128, R, lane)
            acc = acc + d_ref[d][None].astype(cdtype) * sh.astype(cdtype)
        i = 0
        if has_scale:
            acc = acc * e_refs[i][...][None].astype(cdtype)
            i += 1
        if has_add:
            acc = acc + e_refs[i][...].astype(cdtype)
        y_ref[...] = acc

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    extra_specs = [
        (pl.BlockSpec((K, R, 128), lambda b: (z, b, z)) if per_lane
         else pl.BlockSpec((R, 128), lambda b: (b, z)))
        for _, per_lane in extras]
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((K, C, 128),
                         lambda b: (z, jnp.maximum(b * Q32 - one, z), z)),
            pl.BlockSpec((K, R, 128), lambda b: (z, b, z)),
            pl.BlockSpec((K, C, 128),
                         lambda b: (z, jnp.minimum(b * Q32 + Q32, last),
                                    z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
        ] + extra_specs,
        out_specs=pl.BlockSpec((K, R, 128), lambda b: (z, b, z)),
        out_shape=jax.ShapeDtypeStruct((K, n_pad // 128, 128), cdtype),
        interpret=interpret,
    )(x3, x3, x3, data3, *[a for a, _ in extras])
    return y.reshape(K, -1)


def dia_pallas_matmat_k_fused(A, Xk, scale=None, addk=None,
                              interpret=False):
    """Gated entry for the epilogue-carrying K-major matmat; None ->
    caller composes (CPU, dtype/shape gates)."""
    K = Xk.shape[0]
    if not 2 <= K <= 16:
        return None
    B = _fused_block_k(A.data, A.offsets, Xk.T, K)
    if B is None:
        return None
    n_pad = A.n_pad
    if scale is not None and scale.shape != (n_pad,):
        return None
    if addk is not None and addk.shape != Xk.shape:
        return None
    return _dia_pallas_matmat_k(A.data, A.offsets, Xk, B, scale=scale,
                                addk=addk, interpret=interpret)


def _dia_pallas_matvec(data, offsets, x, B, interpret=False,
                       scale=None, addv=None):
    """Fused DIA SpMV y = A@x, optionally with CENTER-BLOCK epilogues
    (round 4, VERDICT item 4): ``scale`` -> y = scale * (A@x) (the
    restrictor's tv factor), ``addv`` -> y = addv + A@x (the
    prolongator's correction add).  Epilogue operands need no halo, so
    they stream as plain center blocks; each fused epilogue saves one
    full read+write pass over the intermediate (~0.09 ms at 4.2M)."""
    nd, n_pad = data.shape
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R,
                     16 if jnp.bfloat16 in (data.dtype, x.dtype) else 8)
    Q = R // C                      # main block = Q halo-chunks
    cdtype = jnp.promote_types(data.dtype, x.dtype)
    x2 = x.reshape(-1, 128)         # NO pad: halos clamp (see _halo_chunks)
    data3 = data.reshape(nd, n_pad // 128, 128)
    extras = []
    if scale is not None:
        extras.append(scale.reshape(-1, 128))
    if addv is not None:
        extras.append(addv.reshape(-1, 128))
    has_scale = scale is not None
    has_add = addv is not None

    def kernel(xlo_ref, xc_ref, xhi_ref, d_ref, *rest):
        e_refs = rest[:-1]
        y_ref = rest[-1]
        xcat = jnp.concatenate(
            [xlo_ref[...], xc_ref[...], xhi_ref[...]],
            axis=0)                                        # (R + 2C, 128)
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = jnp.zeros((R, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted(xcat, off, C * 128, R, lane)
            acc = acc + d_ref[d].astype(cdtype) * sh.astype(cdtype)
        i = 0
        if has_scale:
            acc = acc * e_refs[i][...].astype(cdtype)
            i += 1
        if has_add:
            acc = acc + e_refs[i][...].astype(cdtype)
        y_ref[...] = acc

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, 128),
                         lambda b: (jnp.maximum(b * Q32 - one, z), z)),
            pl.BlockSpec((R, 128), lambda b: (b, z)),
            pl.BlockSpec((C, 128),
                         lambda b: (jnp.minimum(b * Q32 + Q32, last), z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
        ] + [pl.BlockSpec((R, 128), lambda b: (b, z)) for _ in extras],
        out_specs=pl.BlockSpec((R, 128), lambda b: (b, z)),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype),
        interpret=interpret,
    )(x2, x2, x2, data3, *extras)
    return y.reshape(-1)


def dia_pallas_matvec_fused(A, x, scale=None, addv=None, interpret=False):
    """Gated entry for the epilogue-fused SpMV; None -> caller composes
    the unfused form."""
    B = _fused_block(A.data, A.offsets, x)
    if B is None:
        return None
    n_pad = A.n_pad
    if scale is not None and scale.shape != (n_pad,):
        return None
    if addv is not None and addv.shape != (n_pad,):
        return None
    return _dia_pallas_matvec(A.data, A.offsets, x, B, scale=scale,
                              addv=addv, interpret=interpret)


@jax.custom_batching.custom_vmap
def dia_spmv_scaled(A, r, s):
    """s * (A @ r) with the scale fused into the SpMV epilogue (the
    structured restrictor's tv factor — round 4, VERDICT item 4).
    Batched calls reroute to the K-major matmat + broadcast scale."""
    y = dia_pallas_matvec_fused(A, r, scale=s)
    if y is not None:
        return y
    return (A._matvec_impl(r)) * s


@dia_spmv_scaled.def_vmap
def _dia_spmv_scaled_rule(axis_size, in_batched, A, r, s):
    A_b, r_b, s_b = in_batched
    _cv_unbatched_operator(A_b, "DIA")
    assert r_b, "rule invoked with no batched operand"
    if not s_b:
        # shared scale: one (R, 128) center block broadcast over lanes
        # inside the K-major kernel (a separate (K, n) multiply pass
        # costs ~0.9 ms at 4.2M/K=8)
        y = dia_pallas_matmat_k_fused(A, r, scale=s)
        if y is not None:
            return y, True
    y = A.matmat_k(r)
    return y * (s if s_b else s[None, :]), True


@jax.custom_batching.custom_vmap
def dia_spmv_add(A, t, x):
    """x + A @ t with the add fused into the SpMV epilogue (the
    prolongator's coarse-correction add)."""
    y = dia_pallas_matvec_fused(A, t, addv=x)
    if y is not None:
        return y
    return x + A._matvec_impl(t)


@dia_spmv_add.def_vmap
def _dia_spmv_add_rule(axis_size, in_batched, A, t, x):
    A_b, t_b, x_b = in_batched
    _cv_unbatched_operator(A_b, "DIA")
    assert t_b, "rule invoked with no batched operand"
    xk = x if x_b else jnp.broadcast_to(x[None, :], t.shape)
    y = dia_pallas_matmat_k_fused(A, t, addk=xk)
    if y is not None:
        return y, True
    return xk + A.matmat_k(t), True


def dia_pallas_jacobi(A, x, b, dinv, omega, interpret=False,
                      force_B=None):
    """Fused weighted-Jacobi sweep x + omega*dinv*(b - A@x), or None when
    the fused path doesn't apply (caller falls back to composed form).

    ``omega`` may be a python float or a 0-d device array (jacobi_dyn).
    """
    B = force_B if force_B is not None else _fused_block(A.data, A.offsets, x)
    if B is None or b.shape != x.shape or dinv.shape != x.shape:
        return None
    data, offsets = A.data, A.offsets
    nd, n_pad = data.shape
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R,
                     16 if jnp.bfloat16 in (data.dtype, x.dtype) else 8)
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, x.dtype)
    x2 = x.reshape(-1, 128)         # NO pad: halos clamp (see _halo_chunks)
    data3 = data.reshape(nd, n_pad // 128, 128)
    b2 = b.reshape(-1, 128)
    di2 = dinv.reshape(-1, 128)
    om = jnp.asarray(omega, dtype=cdtype).reshape(1, 1)

    def kernel(om_ref, xlo_ref, xc_ref, xhi_ref, d_ref, b_ref, di_ref,
               y_ref):
        xcat = jnp.concatenate(
            [xlo_ref[...], xc_ref[...], xhi_ref[...]], axis=0)
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = jnp.zeros((R, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted(xcat, off, C * 128, R, lane)
            acc = acc + d_ref[d].astype(cdtype) * sh.astype(cdtype)
        xc = xcat[C:C + R].astype(cdtype)
        y_ref[...] = xc + om_ref[0, 0] * (
            di_ref[...].astype(cdtype) * (b_ref[...].astype(cdtype) - acc))

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((C, 128),
                         lambda b: (jnp.maximum(b * Q32 - one, z), z)),
            pl.BlockSpec((R, 128), lambda b: (b, z)),
            pl.BlockSpec((C, 128),
                         lambda b: (jnp.minimum(b * Q32 + Q32, last), z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
            pl.BlockSpec((R, 128), lambda b: (b, z)),
            pl.BlockSpec((R, 128), lambda b: (b, z)),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda b: (b, z)),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype),
        interpret=interpret,
    )(om, x2, x2, x2, data3, b2, di2)
    return y.reshape(-1)


def dia_pallas_jacobi_zero_res(A, b, dinv, omega, interpret=False,
                               force_B=None):
    """Fused zero-guess Jacobi sweep + residual:

        x = omega * dinv * b,   r = b - A @ x

    in ONE kernel pass (round 4, VERDICT item 4: the V-cycle's
    pre-smooth -> residual chain at every zero-entry level re-reads b
    and re-writes/re-reads x between the two ops; fusing computes x on
    the halo-extended block in VMEM and emits both outputs, saving
    ~3n of HBM traffic per level visit).  Returns (x, r), or None when
    the fused path doesn't apply.
    """
    B = force_B if force_B is not None else _fused_block(A.data,
                                                         A.offsets, b)
    if B is None or dinv.shape != b.shape:
        return None
    data, offsets = A.data, A.offsets
    nd, n_pad = data.shape
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R,
                     16 if jnp.bfloat16 in (data.dtype, b.dtype) else 8)
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, b.dtype)
    b2 = b.reshape(-1, 128)
    di2 = dinv.reshape(-1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)
    om = jnp.asarray(omega, dtype=cdtype).reshape(1, 1)

    def kernel(om_ref, blo_ref, bc_ref, bhi_ref, dlo_ref, dc_ref,
               dhi_ref, d_ref, x_ref, r_ref):
        bcat = jnp.concatenate(
            [blo_ref[...], bc_ref[...], bhi_ref[...]], axis=0)
        dicat = jnp.concatenate(
            [dlo_ref[...], dc_ref[...], dhi_ref[...]], axis=0)
        w = om_ref[0, 0]
        xcat = w * (dicat.astype(cdtype) * bcat.astype(cdtype))
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = jnp.zeros((R, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted(xcat, off, C * 128, R, lane)
            acc = acc + d_ref[d].astype(cdtype) * sh
        x_ref[...] = xcat[C:C + R]
        r_ref[...] = bc_ref[...].astype(cdtype) - acc

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    lo_spec = pl.BlockSpec((C, 128),
                           lambda b: (jnp.maximum(b * Q32 - one, z), z))
    c_spec = pl.BlockSpec((R, 128), lambda b: (b, z))
    hi_spec = pl.BlockSpec(
        (C, 128), lambda b: (jnp.minimum(b * Q32 + Q32, last), z))
    x, r = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (z, z),
                         memory_space=pltpu.SMEM),
            lo_spec, c_spec, hi_spec,
            lo_spec, c_spec, hi_spec,
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
        ],
        out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype)],
        interpret=interpret,
    )(om, b2, b2, b2, di2, di2, di2, data3)
    return x.reshape(-1), r.reshape(-1)


def dia_pallas_jacobi_res(A, x, b, dinv, omega, interpret=False,
                          force_B=None):
    """Fused weighted-Jacobi sweep + residual of the UPDATED iterate:

        y = x + omega * dinv * (b - A @ x),   r = b - A @ y

    in ONE kernel pass (round 4: the nonzero-entry pre-smooth ->
    residual chain of W/F/AMLI repeat visits and standalone cycles; the
    separate forms stream the A diagonals twice and re-read y from HBM
    — fusing computes y on a double-halo-extended block in VMEM, saving
    ~6n of traffic).  Returns (y, r), or None when the fused path
    doesn't apply.

    Stage 1 computes y on main-block rows +-C halo chunks (their A
    shifts read x from a 2C-deep halo: five x specs, two clamped chunks
    each side); stage 2 shifts the in-VMEM y.  Out-of-range halo rows
    hold garbage that only ever multiplies structurally-zero diagonal
    slots — the invariant every fused DIA kernel relies on.
    """
    B = force_B if force_B is not None else _fused_block(A.data,
                                                         A.offsets, x)
    if B is None or b.shape != x.shape or dinv.shape != x.shape:
        return None
    data, offsets = A.data, A.offsets
    nd, n_pad = data.shape
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R,
                     16 if jnp.bfloat16 in (data.dtype, x.dtype) else 8)
    if R < 2 * C:
        return None                 # need two distinct halo chunks
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, x.dtype)
    x2 = x.reshape(-1, 128)
    b2 = b.reshape(-1, 128)
    di2 = dinv.reshape(-1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)
    om = jnp.asarray(omega, dtype=cdtype).reshape(1, 1)

    def kernel(om_ref, xll_ref, xlo_ref, xc_ref, xhi_ref, xhh_ref,
               blo_ref, bc_ref, bhi_ref, dlo_ref, dc_ref, dhi_ref,
               glo_ref, gc_ref, ghi_ref, y_ref, r_ref):
        xcat = jnp.concatenate(
            [xll_ref[...], xlo_ref[...], xc_ref[...], xhi_ref[...],
             xhh_ref[...]], axis=0)                     # (R+4C, 128)
        bcat = jnp.concatenate(
            [blo_ref[...], bc_ref[...], bhi_ref[...]], axis=0)
        dicat = jnp.concatenate(
            [dlo_ref[...], dc_ref[...], dhi_ref[...]], axis=0)
        gcat = jnp.concatenate(
            [glo_ref[...], gc_ref[...], ghi_ref[...]], axis=1)
        w = om_ref[0, 0]
        Re = R + 2 * C                  # extended row count for stage 1
        lane_e = lax.broadcasted_iota(jnp.int32, (Re, 128), 1)
        acc1 = jnp.zeros((Re, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted(xcat, off, C * 128, Re, lane_e)
            acc1 = acc1 + gcat[d].astype(cdtype) * sh.astype(cdtype)
        ycat = (xcat[C:C + Re].astype(cdtype)
                + w * (dicat.astype(cdtype)
                       * (bcat.astype(cdtype) - acc1)))
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc2 = jnp.zeros((R, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted(ycat, off, C * 128, R, lane)
            acc2 = acc2 + gcat[d, C:C + R].astype(cdtype) * sh
        y_ref[...] = ycat[C:C + R]
        r_ref[...] = bcat[C:C + R].astype(cdtype) - acc2

    z = np.int32(0)
    one = np.int32(1)
    two = np.int32(2)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    ll_spec = pl.BlockSpec((C, 128),
                           lambda b: (jnp.maximum(b * Q32 - two, z), z))
    lo_spec = pl.BlockSpec((C, 128),
                           lambda b: (jnp.maximum(b * Q32 - one, z), z))
    c_spec = pl.BlockSpec((R, 128), lambda b: (b, z))
    hi_spec = pl.BlockSpec(
        (C, 128), lambda b: (jnp.minimum(b * Q32 + Q32, last), z))
    hh_spec = pl.BlockSpec(
        (C, 128), lambda b: (jnp.minimum(b * Q32 + Q32 + one, last), z))
    glo_spec = pl.BlockSpec(
        (nd, C, 128), lambda b: (z, jnp.maximum(b * Q32 - one, z), z))
    gc_spec = pl.BlockSpec((nd, R, 128), lambda b: (z, b, z))
    ghi_spec = pl.BlockSpec(
        (nd, C, 128),
        lambda b: (z, jnp.minimum(b * Q32 + Q32, last), z))
    y, r = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (z, z),
                         memory_space=pltpu.SMEM),
            ll_spec, lo_spec, c_spec, hi_spec, hh_spec,
            lo_spec, c_spec, hi_spec,
            lo_spec, c_spec, hi_spec,
            glo_spec, gc_spec, ghi_spec,
        ],
        out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype)],
        interpret=interpret,
    )(om, x2, x2, x2, x2, x2, b2, b2, b2, di2, di2, di2,
      data3, data3, data3)
    return y.reshape(-1), r.reshape(-1)


@jax.custom_batching.custom_vmap
def dia_jacobi_res(A, x, b, dinv, omega):
    """(y, r) = (x + omega*dinv*(b - A@x), b - A@y) — the nonzero-entry
    pre-smooth + residual chain as one fused pass (composed fallback
    off-TPU / when the fused gate rejects).  Batched calls reroute to
    the K-major matmat forms."""
    out = dia_pallas_jacobi_res(A, x, b, dinv, omega)
    if out is not None:
        return out
    y = x + omega * (dinv * (b - A._matvec_impl(x)))
    return y, b - A._matvec_impl(y)


@dia_jacobi_res.def_vmap
def _dia_jacobi_res_rule(axis_size, in_batched, A, x, b, dinv, omega):
    A_b, x_b, b_b, di_b, om_b = in_batched
    _cv_unbatched_operator(A_b, "DIA")
    if di_b or any(jax.tree_util.tree_leaves(om_b)):
        raise NotImplementedError(
            "vmap over dinv/omega of the fused jacobi-residual step is "
            "not supported; only x and b may be batched")

    def lanes(v, is_b):
        if is_b:
            return v
        return jnp.broadcast_to(v[None, :], (axis_size,) + v.shape)

    Xk = lanes(x, x_b)
    Bk = lanes(b, b_b)
    Yk = dia_pallas_jacobi_km(A, Xk, Bk, dinv, omega)
    if Yk is None:
        Yk = Xk + jnp.asarray(omega) * (dinv[None, :]
                                        * (Bk - A.matmat_k(Xk)))
    Rk = Bk - A.matmat_k(Yk)
    return (Yk, Rk), (True, True)


def dia_pallas_zero_chain(A, St, b, dinv, tv, omega, interpret=False,
                          force_B=None):
    """Fused ZERO-ENTRY level chain: pre-smooth + residual + scaled
    restrict front-end,

        x = omega * dinv * b
        r = b - A @ x          (never materialized in HBM)
        y = tv * (St @ r)

    in ONE kernel pass (round 4: in the V-cycle's zero-entry visit the
    residual is DEAD after the restrict, so the separate kernels pay a
    full r write + halo read for nothing).  ``St`` is the structured
    restrictor's smoothing-factor transpose; the caller finishes the
    restriction with the block_sum.  Returns (x, y) or None.

    Stage geometry: y at center rows needs r at +-C halo chunks, which
    needs x at +-2C — b/dinv stream with double halos (five specs,
    clamped), A's diagonals with single halos, St/tv center-only.
    Clamped out-of-range reads only ever multiply structurally-zero
    diagonal slots (the fused-DIA invariant)."""
    B = force_B if force_B is not None else _fused_block(A.data,
                                                         A.offsets, b)
    if B is None or dinv.shape != b.shape:
        return None
    if St.n_pad != A.data.shape[1] or tv.shape != b.shape:
        return None
    data, offsets = A.data, A.offsets
    sdata, soffsets = St.data, St.offsets
    nd, n_pad = data.shape
    nds = sdata.shape[0]
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(tuple(offsets) + tuple(soffsets), R,
                     16 if jnp.bfloat16 in (data.dtype, b.dtype) else 8)
    if R < 2 * C:
        return None
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, b.dtype)
    b2 = b.reshape(-1, 128)
    di2 = dinv.reshape(-1, 128)
    tv2 = tv.reshape(-1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)
    sdata3 = sdata.reshape(nds, n_pad // 128, 128)
    om = jnp.asarray(omega, dtype=cdtype).reshape(1, 1)

    def kernel(om_ref, bll_ref, blo_ref, bc_ref, bhi_ref, bhh_ref,
               dll_ref, dlo_ref, dc_ref, dhi_ref, dhh_ref,
               glo_ref, gc_ref, ghi_ref, s_ref, tv_ref, x_ref, y_ref):
        bcat = jnp.concatenate(
            [bll_ref[...], blo_ref[...], bc_ref[...], bhi_ref[...],
             bhh_ref[...]], axis=0)                       # (R+4C, 128)
        dicat = jnp.concatenate(
            [dll_ref[...], dlo_ref[...], dc_ref[...], dhi_ref[...],
             dhh_ref[...]], axis=0)
        gcat = jnp.concatenate(
            [glo_ref[...], gc_ref[...], ghi_ref[...]], axis=1)
        w = om_ref[0, 0]
        xcat = w * (dicat.astype(cdtype) * bcat.astype(cdtype))
        Re = R + 2 * C
        lane_e = lax.broadcasted_iota(jnp.int32, (Re, 128), 1)
        acc1 = jnp.zeros((Re, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted(xcat, off, C * 128, Re, lane_e)
            acc1 = acc1 + gcat[d].astype(cdtype) * sh
        rcat = bcat[C:C + Re].astype(cdtype) - acc1       # r, extended
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc2 = jnp.zeros((R, 128), dtype=cdtype)
        for d, off in enumerate(soffsets):
            sh = _dia_shifted(rcat, off, C * 128, R, lane)
            acc2 = acc2 + s_ref[d].astype(cdtype) * sh
        x_ref[...] = xcat[2 * C:2 * C + R]
        y_ref[...] = tv_ref[...].astype(cdtype) * acc2

    z = np.int32(0)
    one = np.int32(1)
    two = np.int32(2)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    ll_spec = pl.BlockSpec((C, 128),
                           lambda b: (jnp.maximum(b * Q32 - two, z), z))
    lo_spec = pl.BlockSpec((C, 128),
                           lambda b: (jnp.maximum(b * Q32 - one, z), z))
    c_spec = pl.BlockSpec((R, 128), lambda b: (b, z))
    hi_spec = pl.BlockSpec(
        (C, 128), lambda b: (jnp.minimum(b * Q32 + Q32, last), z))
    hh_spec = pl.BlockSpec(
        (C, 128), lambda b: (jnp.minimum(b * Q32 + Q32 + one, last), z))
    glo_spec = pl.BlockSpec(
        (nd, C, 128), lambda b: (z, jnp.maximum(b * Q32 - one, z), z))
    gc_spec = pl.BlockSpec((nd, R, 128), lambda b: (z, b, z))
    ghi_spec = pl.BlockSpec(
        (nd, C, 128),
        lambda b: (z, jnp.minimum(b * Q32 + Q32, last), z))
    s_spec = pl.BlockSpec((nds, R, 128), lambda b: (z, b, z))
    x, y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (z, z),
                         memory_space=pltpu.SMEM),
            ll_spec, lo_spec, c_spec, hi_spec, hh_spec,
            ll_spec, lo_spec, c_spec, hi_spec, hh_spec,
            glo_spec, gc_spec, ghi_spec,
            s_spec, c_spec,
        ],
        out_specs=[c_spec, c_spec],
        out_shape=[jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype),
                   jax.ShapeDtypeStruct((n_pad // 128, 128), cdtype)],
        interpret=interpret,
    )(om, b2, b2, b2, b2, b2, di2, di2, di2, di2, di2,
      data3, data3, data3, sdata3, tv2)
    return x.reshape(-1), y.reshape(-1)


def dia_pallas_zero_chain_km(A, St, Bk, dinv, tv, omega,
                             interpret=False, force_B=None):
    """K-lane fused zero-entry chain: per lane

        x = omega * dinv * b,  y = tv * (St @ (b - A@x))

    with the residual held in VMEM (the K-major analog of
    :func:`dia_pallas_zero_chain`; at K=8 the composed rule's (K, n)
    residual round-trip costs ~0.6 ms at 4.2M).  Returns (X, Y) or
    None.  Uses B=16384 when the default block's double-halo working
    set would exceed the scoped-VMEM budget."""
    if Bk.ndim != 2:
        return None
    K = Bk.shape[0]
    if not 2 <= K <= 16:
        return None
    Bsz = force_B if force_B is not None else _fused_block_k(
        A.data, A.offsets, Bk.T, K)
    if Bsz is None or dinv.shape != (Bk.shape[1],):
        return None
    if St.n_pad != A.data.shape[1] or tv.shape != dinv.shape:
        return None
    data, offsets = A.data, A.offsets
    sdata, soffsets = St.data, St.offsets
    nd, n_pad = data.shape
    nds = sdata.shape[0]
    if force_B is None:
        # three K-lane working arrays (xq, r, y) live simultaneously;
        # halve the block if the default would crowd the scoped VMEM
        while Bsz > 16384 and n_pad % (Bsz // 2) == 0 and \
                (nd + nds + 14 * K) * Bsz * 4 > 9 * 2 ** 20:
            Bsz //= 2
    nb = n_pad // Bsz
    R = Bsz // 128
    C = _halo_chunks(tuple(offsets) + tuple(soffsets), R,
                     16 if jnp.bfloat16 in (data.dtype, Bk.dtype) else 8)
    if R < 2 * C:
        return None
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, Bk.dtype)
    b3 = Bk.reshape(K, -1, 128)
    di2 = dinv.reshape(-1, 128)
    tv2 = tv.reshape(-1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)
    sdata3 = sdata.reshape(nds, n_pad // 128, 128)
    om = jnp.asarray(omega, dtype=cdtype).reshape(1, 1)

    def kernel(om_ref, bll_ref, blo_ref, bc_ref, bhi_ref, bhh_ref,
               dll_ref, dlo_ref, dc_ref, dhi_ref, dhh_ref,
               glo_ref, gc_ref, ghi_ref, s_ref, tv_ref, x_ref, y_ref):
        bcat = jnp.concatenate(
            [bll_ref[...], blo_ref[...], bc_ref[...], bhi_ref[...],
             bhh_ref[...]], axis=1)                    # (K, R+4C, 128)
        dicat = jnp.concatenate(
            [dll_ref[...], dlo_ref[...], dc_ref[...], dhi_ref[...],
             dhh_ref[...]], axis=0)                    # (R+4C, 128)
        gcat = jnp.concatenate(
            [glo_ref[...], gc_ref[...], ghi_ref[...]], axis=1)
        w = om_ref[0, 0]
        xcat = w * (dicat[None].astype(cdtype) * bcat.astype(cdtype))
        Re = R + 2 * C
        lane_e = lax.broadcasted_iota(jnp.int32, (1, Re, 128), 2)
        acc1 = jnp.zeros((K, Re, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted_k(xcat, off, C * 128, Re, lane_e)
            acc1 = acc1 + gcat[d][None].astype(cdtype) * sh
        rcat = bcat[:, C:C + Re].astype(cdtype) - acc1
        lane = lax.broadcasted_iota(jnp.int32, (1, R, 128), 2)
        acc2 = jnp.zeros((K, R, 128), dtype=cdtype)
        for d, off in enumerate(soffsets):
            sh = _dia_shifted_k(rcat, off, C * 128, R, lane)
            acc2 = acc2 + s_ref[d][None].astype(cdtype) * sh
        x_ref[...] = xcat[:, 2 * C:2 * C + R]
        y_ref[...] = tv_ref[...][None].astype(cdtype) * acc2

    z = np.int32(0)
    one = np.int32(1)
    two = np.int32(2)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    kll = pl.BlockSpec((K, C, 128),
                       lambda b: (z, jnp.maximum(b * Q32 - two, z), z))
    klo = pl.BlockSpec((K, C, 128),
                       lambda b: (z, jnp.maximum(b * Q32 - one, z), z))
    kc = pl.BlockSpec((K, R, 128), lambda b: (z, b, z))
    khi = pl.BlockSpec(
        (K, C, 128), lambda b: (z, jnp.minimum(b * Q32 + Q32, last), z))
    khh = pl.BlockSpec(
        (K, C, 128),
        lambda b: (z, jnp.minimum(b * Q32 + Q32 + one, last), z))
    ll = pl.BlockSpec((C, 128),
                      lambda b: (jnp.maximum(b * Q32 - two, z), z))
    lo = pl.BlockSpec((C, 128),
                      lambda b: (jnp.maximum(b * Q32 - one, z), z))
    c = pl.BlockSpec((R, 128), lambda b: (b, z))
    hi = pl.BlockSpec(
        (C, 128), lambda b: (jnp.minimum(b * Q32 + Q32, last), z))
    hh = pl.BlockSpec(
        (C, 128), lambda b: (jnp.minimum(b * Q32 + Q32 + one, last), z))
    glo = pl.BlockSpec(
        (nd, C, 128), lambda b: (z, jnp.maximum(b * Q32 - one, z), z))
    gc = pl.BlockSpec((nd, R, 128), lambda b: (z, b, z))
    ghi = pl.BlockSpec(
        (nd, C, 128),
        lambda b: (z, jnp.minimum(b * Q32 + Q32, last), z))
    s_spec = pl.BlockSpec((nds, R, 128), lambda b: (z, b, z))
    x, y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (z, z),
                         memory_space=pltpu.SMEM),
            kll, klo, kc, khi, khh,
            ll, lo, c, hi, hh,
            glo, gc, ghi,
            s_spec, c,
        ],
        out_specs=[kc, kc],
        out_shape=[jax.ShapeDtypeStruct((K, n_pad // 128, 128), cdtype),
                   jax.ShapeDtypeStruct((K, n_pad // 128, 128), cdtype)],
        interpret=interpret,
    )(om, b3, b3, b3, b3, b3, di2, di2, di2, di2, di2,
      data3, data3, data3, sdata3, tv2)
    return x.reshape(K, -1), y.reshape(K, -1)


@jax.custom_batching.custom_vmap
def dia_zero_chain(A, St, b, dinv, tv, omega):
    """(x, y) = (omega*dinv*b, tv * (St @ (b - A@x))) — the zero-entry
    pre-smooth + residual + scaled-restrict front-end as one fused pass
    (composed fallback off-TPU / when the gate rejects).  Batched calls
    reroute to the K-major fused forms."""
    out = dia_pallas_zero_chain(A, St, b, dinv, tv, omega)
    if out is not None:
        return out
    x = omega * (dinv * b)
    r = b - A._matvec_impl(x)
    return x, tv * St._matvec_impl(r)


@dia_zero_chain.def_vmap
def _dia_zero_chain_rule(axis_size, in_batched, A, St, b, dinv, tv,
                         omega):
    A_b, St_b, b_b, di_b, tv_b, om_b = in_batched
    _cv_unbatched_operator(A_b, "DIA")
    _cv_unbatched_operator(St_b, "DIA")
    if di_b or tv_b or any(jax.tree_util.tree_leaves(om_b)):
        raise NotImplementedError(
            "vmap over dinv/tv/omega of the fused zero chain is not "
            "supported; only b may be batched")
    assert b_b, "rule invoked with no batched operand"
    out = dia_pallas_zero_chain_km(A, St, b, dinv, tv, omega)
    if out is not None:
        return out, (True, True)
    out = dia_pallas_jacobi_zero_res_km(A, b, dinv, omega)
    if out is not None:
        Xk, Rk = out
    else:
        Xk = jnp.asarray(omega) * (dinv[None, :] * b)
        Rk = b - A.matmat_k(Xk)
    Yk = dia_pallas_matmat_k_fused(St, Rk, scale=tv)
    if Yk is None:
        Yk = St.matmat_k(Rk) * tv[None, :]
    return (Xk, Yk), (True, True)


def dia_pallas_jacobi_zero_res_km(A, Bk, dinv, omega, interpret=False,
                                  force_B=None):
    """K-lane fused zero-guess Jacobi + residual:

        X = omega * dinv * B,   R = B - A @ X

    one kernel pass for all K lanes, K-MAJOR (K, n_pad) in/out (the
    batched analog of :func:`dia_pallas_jacobi_zero_res`; the composed
    batch rule pays an extra full (K, n) stack round-trip — ~0.9 ms at
    4.2M/K=8).  Returns (X, R) or None."""
    if Bk.ndim != 2:
        return None
    K = Bk.shape[0]
    if not 2 <= K <= 16:
        return None
    Bsz = force_B if force_B is not None else _fused_block_k(
        A.data, A.offsets, Bk.T, K)
    if Bsz is None or dinv.shape != (Bk.shape[1],):
        return None
    data, offsets = A.data, A.offsets
    nd, n_pad = data.shape
    nb = n_pad // Bsz
    R = Bsz // 128
    C = _halo_chunks(offsets, R,
                     16 if jnp.bfloat16 in (data.dtype, Bk.dtype) else 8)
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, Bk.dtype)
    b3 = Bk.reshape(K, -1, 128)
    di2 = dinv.reshape(-1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)
    om = jnp.asarray(omega, dtype=cdtype).reshape(1, 1)

    def kernel(om_ref, blo_ref, bc_ref, bhi_ref, dlo_ref, dc_ref,
               dhi_ref, d_ref, x_ref, r_ref):
        bcat = jnp.concatenate(
            [blo_ref[...], bc_ref[...], bhi_ref[...]],
            axis=1)                                      # (K, R+2C, 128)
        dicat = jnp.concatenate(
            [dlo_ref[...], dc_ref[...], dhi_ref[...]], axis=0)
        w = om_ref[0, 0]
        xcat = w * (dicat[None].astype(cdtype) * bcat.astype(cdtype))
        lane = lax.broadcasted_iota(jnp.int32, (1, R, 128), 2)
        acc = jnp.zeros((K, R, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted_k(xcat, off, C * 128, R, lane)
            acc = acc + d_ref[d][None].astype(cdtype) * sh
        x_ref[...] = xcat[:, C:C + R]
        r_ref[...] = bc_ref[...].astype(cdtype) - acc

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    klo_spec = pl.BlockSpec(
        (K, C, 128), lambda b: (z, jnp.maximum(b * Q32 - one, z), z))
    kc_spec = pl.BlockSpec((K, R, 128), lambda b: (z, b, z))
    khi_spec = pl.BlockSpec(
        (K, C, 128),
        lambda b: (z, jnp.minimum(b * Q32 + Q32, last), z))
    x, r = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (z, z),
                         memory_space=pltpu.SMEM),
            klo_spec, kc_spec, khi_spec,
            pl.BlockSpec((C, 128),
                         lambda b: (jnp.maximum(b * Q32 - one, z), z)),
            pl.BlockSpec((R, 128), lambda b: (b, z)),
            pl.BlockSpec((C, 128),
                         lambda b: (jnp.minimum(b * Q32 + Q32, last), z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
        ],
        out_specs=[kc_spec, kc_spec],
        out_shape=[jax.ShapeDtypeStruct((K, n_pad // 128, 128), cdtype),
                   jax.ShapeDtypeStruct((K, n_pad // 128, 128), cdtype)],
        interpret=interpret,
    )(om, b3, b3, b3, di2, di2, di2, data3)
    return x.reshape(K, -1), r.reshape(K, -1)


@jax.custom_batching.custom_vmap
def dia_jacobi_zero_res(A, b, dinv, omega):
    """(x, r) = (omega*dinv*b, b - A @ x) — the zero-entry pre-smooth +
    residual chain as one fused pass (falls back to the composed form
    off-TPU / when the fused gate rejects).  Batched calls reroute to
    the K-major matmat."""
    out = dia_pallas_jacobi_zero_res(A, b, dinv, omega)
    if out is not None:
        return out
    x = omega * (dinv * b)
    return x, b - A._matvec_impl(x)


@dia_jacobi_zero_res.def_vmap
def _dia_jacobi_zero_res_rule(axis_size, in_batched, A, b, dinv, omega):
    A_b, b_b, di_b, om_b = in_batched
    _cv_unbatched_operator(A_b, "DIA")
    if di_b or any(jax.tree_util.tree_leaves(om_b)):
        raise NotImplementedError(
            "vmap over dinv/omega of the fused zero-residual step is "
            "not supported; only b may be batched")
    assert b_b, "rule invoked with no batched operand"
    out = dia_pallas_jacobi_zero_res_km(A, b, dinv, omega)
    if out is not None:
        return out, (True, True)
    Xk = jnp.asarray(omega) * (dinv[None, :] * b)
    Rk = b - A.matmat_k(Xk)
    return (Xk, Rk), (True, True)


def dia_pallas_jacobi_k(A, X, Bc, dinv, omega, interpret=False,
                        force_B=None):
    """Column-stack (n_pad, K) wrapper over the K-major fused Jacobi."""
    if X.ndim != 2 or Bc.shape != X.shape:
        return None
    y = dia_pallas_jacobi_km(A, X.T, Bc.T, dinv, omega,
                             interpret=interpret, force_B=force_B)
    return None if y is None else y.T


def dia_pallas_jacobi_km(A, Xk, Bk, dinv, omega, interpret=False,
                         force_B=None):
    """Fused K-lane weighted-Jacobi sweep X + omega*dinv*(B - A@X), or
    None when the fused path doesn't apply.  The multi-RHS form of
    :func:`dia_pallas_jacobi`: one VMEM pass over the diagonal data and
    halo-extended x blocks for ALL K lanes.  K-MAJOR (K, n_pad) in/out —
    the batched-solve layout, zero transposes (round-4 item 3)."""
    if Xk.ndim != 2 or Bk.shape != Xk.shape:
        return None
    K = Xk.shape[0]
    if not 2 <= K <= 16:
        return None
    Bsz = force_B if force_B is not None else _fused_block_k(
        A.data, A.offsets, Xk.T, K)
    if Bsz is None or dinv.shape != (Xk.shape[1],):
        return None
    data, offsets = A.data, A.offsets
    nd, n_pad = data.shape
    nb = n_pad // Bsz
    R = Bsz // 128
    C = _halo_chunks(offsets, R,
                     16 if jnp.bfloat16 in (data.dtype, Xk.dtype) else 8)
    Q = R // C
    cdtype = jnp.promote_types(data.dtype, Xk.dtype)
    x3 = Xk.reshape(K, -1, 128)     # NO pad: halos clamp (_halo_chunks)
    b3 = Bk.reshape(K, -1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)
    di2 = dinv.reshape(-1, 128)
    om = jnp.asarray(omega, dtype=cdtype).reshape(1, 1)

    def kernel(om_ref, xlo_ref, xc_ref, xhi_ref, d_ref, b_ref, di_ref,
               y_ref):
        xcat = jnp.concatenate(
            [xlo_ref[...], xc_ref[...], xhi_ref[...]],
            axis=1)                                      # (K, R+2C, 128)
        lane = lax.broadcasted_iota(jnp.int32, (1, R, 128), 2)
        acc = jnp.zeros((K, R, 128), dtype=cdtype)
        for d, off in enumerate(offsets):
            sh = _dia_shifted_k(xcat, off, C * 128, R, lane)
            acc = acc + d_ref[d][None].astype(cdtype) * sh.astype(cdtype)
        xc = xcat[:, C:C + R].astype(cdtype)
        y_ref[...] = xc + om_ref[0, 0] * (
            di_ref[...][None].astype(cdtype)
            * (b_ref[...].astype(cdtype) - acc))

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda b: (z, z),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((K, C, 128),
                         lambda b: (z, jnp.maximum(b * Q32 - one, z), z)),
            pl.BlockSpec((K, R, 128), lambda b: (z, b, z)),
            pl.BlockSpec((K, C, 128),
                         lambda b: (z, jnp.minimum(b * Q32 + Q32, last),
                                    z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
            pl.BlockSpec((K, R, 128), lambda b: (z, b, z)),
            pl.BlockSpec((R, 128), lambda b: (b, z)),
        ],
        out_specs=pl.BlockSpec((K, R, 128), lambda b: (z, b, z)),
        out_shape=jax.ShapeDtypeStruct((K, n_pad // 128, 128), cdtype),
        interpret=interpret,
    )(om, x3, x3, x3, data3, b3, di2)
    return y.reshape(K, -1)


def dia_from_scipy(A, dtype=jnp.float32, row_pad=8, max_diags=None):
    """Convert a square scipy sparse matrix to DIAMatrix.

    Returns None if the matrix has more distinct diagonals than
    ``max_diags`` (caller falls back to another format).
    """
    A = sp.coo_matrix(A)
    n, m = A.shape
    if n != m:
        raise ValueError("DIA requires a square matrix")
    n_pad = pad_to(max(n, 1), row_pad)
    offs_all = A.col - A.row
    offsets = np.unique(offs_all)
    if max_diags is not None and len(offsets) > max_diags:
        return None
    d_index = np.searchsorted(offsets, offs_all)
    host_dt = (np.complex128 if jnp.issubdtype(jnp.dtype(dtype),
                                               jnp.complexfloating)
               else np.float64)
    data = np.zeros((len(offsets), n_pad), dtype=host_dt)
    data[d_index, A.row] = A.data if data.size else 0
    return DIAMatrix(
        data=jnp.asarray(data, dtype=dtype),
        offsets=tuple(int(o) for o in offsets),
        shape=(n, m),
        nnz=int(A.nnz),
    )


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class DenseOperator:
    """Dense device operator for small (coarse) levels: MXU matvec."""

    data: jnp.ndarray            # (n_pad, m_pad)
    shape: Tuple[int, int]
    nnz: int

    def tree_flatten(self):
        return (self.data,), (self.shape, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        shape, nnz = aux
        return cls(data=data, shape=shape, nnz=nnz)

    @property
    def n_pad(self):
        return self.data.shape[0]

    @property
    def dtype(self):
        return self.data.dtype

    # NOTE precision=HIGHEST: TPU's Precision.DEFAULT runs f32 dots as
    # reduced-precision MXU passes; coarse-level applies sit inside every
    # V-cycle, and a ~1e-3-relative coarse correction error degrades the
    # preconditioner (and, for f64 hierarchies, silently breaks the f64
    # contract).  Coarse dense sizes are <= ~2k, so HIGHEST costs nothing
    # measurable.
    def matvec(self, x):
        return jnp.dot(self.data, x, preferred_element_type=self.data.dtype,
                       precision=lax.Precision.HIGHEST)

    def rmatvec(self, x):
        return jnp.dot(x, self.data, preferred_element_type=self.data.dtype,
                       precision=lax.Precision.HIGHEST)

    def __matmul__(self, x):
        if x.ndim == 1:
            return self.matvec(x)
        return jnp.dot(self.data, x, preferred_element_type=self.data.dtype,
                       precision=lax.Precision.HIGHEST)

    def diagonal(self):
        return jnp.diagonal(self.data) if self.data.shape[0] == self.data.shape[1] \
            else jnp.zeros(self.n_pad, dtype=self.dtype)


def dense_from_scipy(A, dtype=jnp.float32, row_pad=8):
    """Convert scipy sparse to a padded DenseOperator."""
    A = sp.csr_matrix(A)
    n, m = A.shape
    n_pad = pad_to(max(n, 1), row_pad)
    m_pad = pad_to(max(m, 1), row_pad)
    host_dt = (np.complex128 if jnp.issubdtype(jnp.dtype(dtype),
                                               jnp.complexfloating)
               else np.float64)
    data = np.zeros((n_pad, m_pad), dtype=host_dt)
    data[:n, :m] = A.toarray()
    return DenseOperator(
        data=jnp.asarray(data, dtype=dtype), shape=(n, m), nnz=int(A.nnz))


def dia_from_stencil(S, grid, dtype=jnp.float32):
    """Build a grid-stencil DIA operator DIRECTLY ON DEVICE.

    Device analog of gallery.stencil_grid (SURVEY.md §2.3 gallery): for a
    dense stencil array S (shape (3,)*d or (5,)*d ... centered), each
    nonzero stencil entry becomes one diagonal whose data is the constant
    value masked by boundary validity — computed from per-dim iotas, so
    NOTHING is built or uploaded from host (measured round 2: host
    CSR->DIA conversion + relay upload of a 2048^2 Poisson operator costs
    ~13 s; this path costs ~0).
    """
    S = np.asarray(S)
    grid = tuple(int(g) for g in grid)
    dim = len(grid)
    if S.ndim != dim:
        raise ValueError("stencil dim must match grid dim")
    center = tuple(s // 2 for s in S.shape)
    n = int(np.prod(grid))

    entries = []
    for idx in np.ndindex(*S.shape):
        v = S[idx]
        if v == 0:
            continue
        coords = tuple(int(i) - c for i, c in zip(idx, center))
        off = 0
        stride_acc = 1
        for d in range(dim - 1, -1, -1):
            off += coords[d] * stride_acc
            stride_acc *= grid[d]
        entries.append((int(off), coords, float(np.real(v))
                        if not np.iscomplexobj(S) else complex(v)))
    entries.sort(key=lambda e: e[0])

    nnz = 0
    for _off, coords, _v in entries:
        count = 1
        for d in range(dim):
            count *= grid[d] - abs(coords[d])
        nnz += count
    key = tuple((c, v) for _o, c, v in entries)
    data = _stencil_data(key, grid, jnp.dtype(dtype).name)
    return DIAMatrix(
        data=data,
        offsets=tuple(e[0] for e in entries),
        shape=(n, n),
        nnz=int(nnz),
    )


@partial(jax.jit, static_argnames=("entries", "grid", "dtype"))
def _stencil_data(entries, grid, dtype):
    dim = len(grid)
    rows = []
    for coords, v in entries:
        mask = None
        for d in range(dim):
            i = jnp.arange(grid[d])
            ok = (i + coords[d] >= 0) & (i + coords[d] < grid[d])
            shape = [1] * dim
            shape[d] = grid[d]
            ok = ok.reshape(shape)
            mask = ok if mask is None else (mask & ok)
        rows.append(jnp.where(mask, jnp.asarray(v, dtype=dtype),
                              0).reshape(-1))
    return jnp.stack(rows)


def dia_spgemm(A: DIAMatrix, B: DIAMatrix):
    """Gather-free device SpGEMM for banded operators: C = A @ B.

    The banded-times-banded product is a sum over offset pairs,

        C_data[oa + ob] += A_data[oa] * roll(B_data[ob], -oa),

    so the whole SpGEMM is rolls + elementwise FMAs — the TPU-native
    form of the reference's csr_matmat for banded operands (SURVEY.md
    §2.4 L0; BASELINE.json:5 "SpGEMM for RAP and P^T A P").  Wrap-around
    terms vanish because out-of-range entries store zero.  Output offsets
    are the (static) sums of the input offsets; general RAP with windowed
    transfer operators remains a host-side product by design (DESIGN.md).
    """
    if A.shape[1] != B.shape[0]:
        raise ValueError("dimension mismatch")
    if A.n_pad != B.n_pad:
        raise ValueError("operands must share padding")
    acc = {}
    for da, oa in enumerate(A.offsets):
        a = A.data[da]
        for db, ob in enumerate(B.offsets):
            oc = oa + ob
            term = a * jnp.roll(B.data[db], -oa)
            if oc in acc:
                acc[oc] = acc[oc] + term
            else:
                acc[oc] = term
    offsets = tuple(sorted(acc.keys()))
    data = jnp.stack([acc[o] for o in offsets])
    nnz_est = min(A.nnz * max(len(B.offsets), 1), len(offsets) * A.shape[0])
    return DIAMatrix(data=data, offsets=offsets,
                     shape=(A.shape[0], B.shape[1]), nnz=int(nnz_est))
