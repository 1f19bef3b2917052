"""Windowed ELL SpMV — the Pallas gather-free kernel for transfer operators.

Why this exists (measured on the target TPU): XLA's general gather runs
~7.7 ns/element AND permanently degrades the whole session's dispatch
latency once executed — so the compiled solve path may contain **zero
XLA gather ops**.  Square banded operators use DIA (rolled SpMV); this
kernel covers everything else with *bounded column windows*: AMG transfer
operators (P, R) and reordered operators touch, per contiguous row block,
only a narrow window of the source vector.

Layout (host-built):
- rows grouped into blocks of ``BLOCK``; block b's column window is
  [starts[b]*W2, starts[b]*W2 + W) with W = 2*W2, W2 a multiple of 128 —
  aligned so the window is exactly two block-indexable chunks that the
  Pallas pipeline streams in via its normal (double-buffered) BlockSpec
  machinery; no manual DMA, no semaphores.
- per-entry indices are stored window-relative, split into chunk index
  ``hi`` (one-hot resolved on the MXU against the window chunks) and
  lane index ``lo`` (one-hot resolved on the VPU within 128 lanes).

Per entry the cost is ~(W/128 MXU MACs + 3*128 VPU ops) — the "one-hot
tax" — trading arithmetic the TPU has in abundance for the gathers it
cannot do.  Reference counterpart: scipy csr_matvec for P/R products
(SURVEY.md §3.2 hot loop).
"""

from __future__ import annotations

from dataclasses import dataclass
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

__all__ = ["WindowedELL", "TransposedWindowed", "windowed_from_scipy",
           "ComplexWindowed", "ComplexTransposedWindowed",
           "complex_windowed_from_scipy"]

_LANES = 128

# dtypes the Pallas kernels support (Mosaic vectors; complex must take
# the re/im-split ComplexWindowed wrapper, f64 uses the HIGHEST path)
_PALLAS_DTYPES = (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16),
                  jnp.dtype(jnp.float64))


def _split3_bf16(x):
    """Dekker-style 3-way bf16 split of an f32 array: x ~= b0 + b1 + b2
    with each piece exactly bf16-representable.  The pieces capture the
    top 3x8 mantissa bits; the dropped tail is <= 2^-26 relative — below
    one f32 ulp of the recomposed value.  Lets one-hot MXU selections
    run as 3 default bf16 passes instead of Precision.HIGHEST's 6 for
    the same effective f32 accuracy (measured 1.9x on the windowed
    transfer kernels)."""
    b0 = x.astype(jnp.bfloat16)
    r1 = x - b0.astype(jnp.float32)
    b1 = r1.astype(jnp.bfloat16)
    b2 = (r1 - b1.astype(jnp.float32)).astype(jnp.bfloat16)
    return b0, b1, b2


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class WindowedELL:
    """Window-blocked ELL matrix (see module docstring)."""

    data: jnp.ndarray      # (n_blocks, k, BLOCK) f32 (k-major for lean VMEM)
    idx: jnp.ndarray       # (n_blocks, k, BLOCK) int32 window-relative
    #                        index, PACKED: idx = chunk*128 + lane.  One
    #                        packed word instead of separate hi/lo arrays
    #                        halves the kernel's index HBM traffic and the
    #                        relay upload volume (unpack = shift/mask on
    #                        the VPU, free next to the one-hot dots).
    starts: jnp.ndarray    # (n_blocks,) int32, window start in W2 units
    shape: Tuple[int, int]
    block: int             # rows per block (static)
    w2: int                # half-window in elements, multiple of 128
    m_chunks: int          # padded source length in W2 units (static)
    nnz: int

    def tree_flatten(self):
        return (self.data, self.idx, self.starts), (
            self.shape, self.block, self.w2, self.m_chunks, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, idx, starts = children
        shape, block, w2, m_chunks, nnz = aux
        return cls(data=data, idx=idx, starts=starts, shape=shape,
                   block=block, w2=w2, m_chunks=m_chunks, nnz=nnz)

    @property
    def n_pad(self):
        return self.data.shape[0] * self.block

    @property
    def k(self):
        return self.data.shape[1]

    @property
    def dtype(self):
        return self.data.dtype

    # ------------------------------------------------------------------

    def _x_padded(self, x):
        need = self.m_chunks * self.w2
        if x.shape[0] < need:
            x = jnp.pad(x, (0, need - x.shape[0]))
        elif x.shape[0] > need:
            x = x[:need]
        return x

    def matvec(self, x):
        """Routed through a custom_vmap entry: batched (vmap) calls apply
        matmat on the column stack — the Pallas kernel has no batching
        rule and must never be traced under vmap."""
        return _windowed_matvec_cv(self, x)

    def _matvec_impl(self, x):
        if (jax.default_backend() == "tpu" and pltpu is not None
                and self.block % 128 == 0 and self.w2 % 1024 == 0
                and jnp.dtype(self.dtype) in _PALLAS_DTYPES):
            return self._matvec_pallas(x)
        return self._matvec_reference(x)

    def _can_transpose_pallas(self):
        return (self.block % 128 == 0 and self.w2 % 1024 == 0
                and self.m_chunks * self.w2 * 4 <= 6 * 2**20
                and jnp.dtype(self.dtype) in _PALLAS_DTYPES)

    def _matvec_reference(self, x):
        """Gather-based fallback (CPU tests; NEVER traced on TPU)."""
        x = self._x_padded(x)
        gidx = (self.starts[:, None, None] * self.w2
                + self.idx)                            # (n_blocks, k, BLOCK)
        vals = jnp.take(x, gidx, axis=0)
        return jnp.sum(self.data * vals, axis=1).reshape(-1)

    def _matvec_pallas(self, x, interpret=False):
        """Forward one-hot SpMV, v2 (round 2): the LANE selection runs on
        the MXU (contraction dim = 128, full systolic utilization) and the
        cheap CHUNK selection (H values) on the VPU — v1 had the stages
        the other way around, contracting over H=16 at ~12% MXU
        utilization.  Measured (1M-row SA prolongator, k=4): 1.75 ms vs
        5.0 ms for v1."""
        x = self._x_padded(x)
        n_blocks, k, BLOCK = self.data.shape
        H2 = self.w2 // _LANES           # chunks per half-window
        H = 2 * H2
        x2 = x.reshape(self.m_chunks * H2, _LANES)
        dtype = self.data.dtype

        # MXU accumulators must be 32-bit: compute in f32 even for bf16
        # operands, cast on the way out
        cdtype = jnp.float32 if dtype == jnp.bfloat16 else dtype

        def kernel(starts_ref, data_ref, idx_ref, xa_ref, xb_ref,
                   y_ref):
            xw = jnp.concatenate([xa_ref[...], xb_ref[...]],
                                 axis=0).astype(cdtype)               # (H,128)
            lane_iota = lax.broadcasted_iota(jnp.int32, (_LANES, BLOCK), 0)
            chunk_iota = lax.broadcasted_iota(jnp.int32, (H, BLOCK), 0)
            # stage-1 operand: Dekker 3-way bf16 split of xw, so the
            # one-hot lane selection runs as THREE default bf16 MXU
            # passes instead of HIGHEST's six — error <= 2^-26 relative
            # (below the f32 apply's own rounding); see _split3_bf16
            xws = _split3_bf16(xw) if cdtype == jnp.float32 else None
            acc = jnp.zeros((1, BLOCK), dtype=cdtype)
            for s in range(k):                      # static unroll
                idx_s = idx_ref[0, s:s + 1, :]      # (1, BLOCK) packed
                hi_s = lax.shift_right_logical(idx_s, np.int32(7))
                lo_s = jnp.bitwise_and(idx_s, np.int32(127))
                # stage 1 (MXU): one-hot lane selection, contraction=128
                if xws is not None:
                    OHl = (lane_iota == lo_s).astype(jnp.bfloat16)
                    C = sum(jnp.dot(p, OHl,
                                    preferred_element_type=jnp.float32)
                            for p in xws)                       # (H, BLOCK)
                else:
                    # f64 path: HIGHEST keeps the selection exact
                    OHl = (lane_iota == lo_s).astype(cdtype)
                    C = jnp.dot(xw, OHl, preferred_element_type=cdtype,
                                precision=lax.Precision.HIGHEST)
                # stage 2 (VPU): one-hot chunk selection over H values
                v = jnp.sum(jnp.where(chunk_iota == hi_s, C, 0), axis=0,
                            keepdims=True)                      # (1, BLOCK)
                acc = acc + v * data_ref[0, s:s + 1, :].astype(cdtype)
            y_ref[0] = acc.astype(dtype)

        # NOTE: literal zeros must be int32 — under jax_enable_x64 python
        # ints in index maps become i64, which Mosaic cannot legalize
        z = np.int32(0)
        one = np.int32(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((H2, _LANES), lambda b, s: (s[b], z)),
                pl.BlockSpec((H2, _LANES), lambda b, s: (s[b] + one, z)),
            ],
            out_specs=pl.BlockSpec((1, 1, BLOCK), lambda b, s: (b, z, z)),
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, 1, BLOCK), dtype),
            interpret=interpret,
        )(self.starts, self.data, self.idx, x2, x2)
        return y.reshape(-1)

    def _rmatvec_pallas(self, r, interpret=False):
        """True transpose apply A.T @ r as a Pallas kernel (round 2).

        Grid over the ROW blocks (the forward geometry, small windows);
        the full transposed output vector lives in VMEM for the whole
        grid (revisited output block), each step accumulating its
        window's contribution at a dynamic sublane offset:

            out[start*H2 : start*H2+H] += sum_s Amat_s @ Bmat_s^T,
            Amat_s[h, e] = 1[hi=h] * data * r,  Bmat_s[l, e] = 1[lo=l]

        contracting over the BLOCK dim (2048 — full MXU utilization,
        no transposes: dot_general over the shared last dim).  This lets
        restriction operators run with the PROLONGATOR's geometry
        (windowed(R^T) applied backwards) instead of their own
        huge-window one (a coarse row block spans many fine grid rows:
        measured w2=16384, H=256 -> 6 ms at 175k rows vs ~1.8 ms this
        way).  Gate: transposed output must fit VMEM
        (_can_transpose_pallas)."""
        n_blocks, k, BLOCK = self.data.shape
        H2 = self.w2 // _LANES
        H = 2 * H2
        out_chunks = self.m_chunks * H2
        dtype = self.data.dtype
        cdtype = jnp.float32 if dtype == jnp.bfloat16 else dtype
        r3 = r[: self.n_pad].reshape(n_blocks, 1, BLOCK)

        def kernel(starts_ref, data_ref, idx_ref, r_ref, y_ref):
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _init():
                y_ref[...] = jnp.zeros_like(y_ref)

            rb = r_ref[0].astype(cdtype)                    # (1, BLOCK)
            lane_iota = lax.broadcasted_iota(jnp.int32, (_LANES, BLOCK), 0)
            chunk_iota = lax.broadcasted_iota(jnp.int32, (H, BLOCK), 0)
            acc = jnp.zeros((H, _LANES), dtype=cdtype)
            dims = (((1,), (1,)), ((), ()))
            for s in range(k):
                idx_s = idx_ref[0, s:s + 1, :]
                hi_s = lax.shift_right_logical(idx_s, np.int32(7))
                lo_s = jnp.bitwise_and(idx_s, np.int32(127))
                w = data_ref[0, s:s + 1, :].astype(cdtype) * rb  # (1, BLOCK)
                if cdtype == jnp.float32:
                    # split the weighted residual (the one-hot Bmat is
                    # exact in bf16): 3 default passes vs HIGHEST's 6.
                    # The one-hot select runs in f32 and casts after —
                    # exact (pieces are bf16-representable), and avoids a
                    # Mosaic i1-mask relayout bug on bf16 selects.
                    Bmat = (lane_iota == lo_s).astype(jnp.bfloat16)
                    for p in _split3_bf16(w):
                        Amat = jnp.where(chunk_iota == hi_s,
                                         p.astype(jnp.float32),
                                         0.0).astype(jnp.bfloat16)
                        acc = acc + lax.dot_general(
                            Amat, Bmat, dims,
                            preferred_element_type=jnp.float32)  # (H, 128)
                else:
                    Amat = jnp.where(chunk_iota == hi_s, w, 0)   # (H, BLOCK)
                    Bmat = (lane_iota == lo_s).astype(cdtype)    # (128,BLOCK)
                    acc = acc + lax.dot_general(
                        Amat, Bmat, dims,
                        preferred_element_type=cdtype,
                        precision=lax.Precision.HIGHEST)         # (H, 128)
            start = starts_ref[b]
            sl = pl.ds(start * H2, H)
            y_ref[sl, :] = y_ref[sl, :] + acc.astype(dtype)

        z = np.int32(0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((1, 1, BLOCK), lambda b, s: (b, z, z)),
            ],
            out_specs=pl.BlockSpec((out_chunks, _LANES),
                                   lambda b, s: (z, z)),
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_chunks, _LANES), dtype),
            interpret=interpret,
        )(self.starts, self.data, self.idx, r3)
        return y.reshape(-1)

    def rmatvec(self, x):
        """A.T @ x: Pallas transpose kernel on TPU, scatter-add fallback
        elsewhere (CPU tests / VMEM-oversized outputs).  Batched (vmap)
        calls route to :meth:`rmatmat`."""
        return _windowed_rmatvec_cv(self, x)

    def _rmatvec_impl(self, x):
        if (jax.default_backend() == "tpu" and pltpu is not None
                and self._can_transpose_pallas()):
            return self._rmatvec_pallas(x)
        return self._rmatvec_reference(x)

    def _rmatvec_reference(self, x):
        gidx = (self.starts[:, None, None] * self.w2
                + self.idx)                            # (n_blocks, k, BLOCK)
        xb = x[: self.n_pad].reshape(self.data.shape[0], 1, self.block)
        y = jnp.zeros(self.m_chunks * self.w2, dtype=self.dtype)
        return y.at[gidx].add(self.data * xb)

    def select(self, x):
        """Per-slot window selection: out[b, s, r] = x[starts[b]*w2
        + idx[b, s, r]] — the gather-free "read x at my column" primitive
        that powers the UNSTRUCTURED device setup (engine/
        unstructured_setup.py): strength measures, Luby MIS neighbor
        reductions, aggregate-root lookups and tentative-operator
        construction are all elementwise functions of selected vectors.
        Pallas one-hot kernel on TPU, take() elsewhere.

        CONTRACT: payloads must be FINITE f32 (±inf/NaN poison the
        one-hot MXU selection: inf*0 = NaN) — callers encode "absent"
        as finite sentinels.  Selection is EXACT for f32-encoded
        integers < 2^24 and <= 2^-26-relative for arbitrary f32 (the
        Dekker 3-way bf16 split; the one-hot factor is exactly 1.0, so
        each piece is selected exactly).  Setup-phase only; the solve
        path never calls this."""
        if (jax.default_backend() == "tpu" and pltpu is not None
                and self.block % 128 == 0 and self.w2 % 1024 == 0
                and jnp.dtype(x.dtype) == jnp.dtype(jnp.float32)):
            return self._select_pallas(x)
        return self._select_reference(x)

    def _select_reference(self, x):
        x = self._x_padded(x)
        gidx = (self.starts[:, None, None] * self.w2 + self.idx)
        return jnp.take(x, gidx, axis=0)

    def _select_pallas(self, x, interpret=False):
        """The _matvec_pallas geometry with per-slot outputs instead of
        the data-weighted accumulation."""
        x = self._x_padded(x)
        n_blocks, k, BLOCK = self.data.shape
        H2 = self.w2 // _LANES
        H = 2 * H2
        x2 = x.reshape(self.m_chunks * H2, _LANES)
        dtype = x.dtype

        def kernel(starts_ref, idx_ref, xa_ref, xb_ref, y_ref):
            xw = jnp.concatenate([xa_ref[...], xb_ref[...]], axis=0)
            lane_iota = lax.broadcasted_iota(jnp.int32, (_LANES, BLOCK), 0)
            chunk_iota = lax.broadcasted_iota(jnp.int32, (H, BLOCK), 0)
            # Dekker 3-way bf16 split of the payload — three default
            # bf16 MXU passes (the matvec kernel's stage-1 recipe;
            # Precision.HIGHEST here compiled ~700 s/kernel through the
            # relay Mosaic pipeline, measured round 4).  Selection of
            # each piece is exact (one-hot factor = 1.0), so the
            # recomposed value carries only the split's <= 2^-26 tail —
            # zero for integer payloads < 2^24.
            xws = _split3_bf16(xw)
            rows = []
            for s in range(k):                      # static unroll
                idx_s = idx_ref[0, s:s + 1, :]
                hi_s = lax.shift_right_logical(idx_s, np.int32(7))
                lo_s = jnp.bitwise_and(idx_s, np.int32(127))
                OHl = (lane_iota == lo_s).astype(jnp.bfloat16)
                C = sum(jnp.dot(p, OHl,
                                preferred_element_type=jnp.float32)
                        for p in xws)                         # (H, BLOCK)
                rows.append(jnp.sum(
                    jnp.where(chunk_iota == hi_s, C, 0), axis=0,
                    keepdims=True))                           # (1, BLOCK)
            # one full-block 2-D store (per-row y_ref[0, s] stores are
            # not reliably legalizable; a round-4 variant faulted the
            # TPU worker)
            y_ref[0] = jnp.concatenate(rows, axis=0).astype(dtype)

        z = np.int32(0)
        one = np.int32(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((H2, _LANES), lambda b, s: (s[b], z)),
                pl.BlockSpec((H2, _LANES), lambda b, s: (s[b] + one, z)),
            ],
            out_specs=pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, k, BLOCK), dtype),
            interpret=interpret,
        )(self.starts, self.idx, x2, x2)

    def matmat(self, X):
        """Y = A @ X for a padded column stack X (m_pad, K).

        On TPU with small K the fused multi-RHS kernel streams the
        operator's data/idx from HBM ONCE for all K lanes (the
        per-column form re-reads them K times — the dominant traffic for
        transfer operators); otherwise per-column matvecs (static
        unroll).  Covers the engine's batched-RHS solves."""
        K = X.shape[1]
        H = 2 * self.w2 // _LANES
        # per-call lane cap: the stage-1 intermediate C is (K*H, BLOCK)
        # f32 resident in VMEM — at block=8192 K=8 H=32 that's 8 MB and
        # Mosaic OOMs (caught live in round 3's bench).  Large blocks
        # therefore run the fused kernel over K-chunks instead of
        # falling back to K separate matvecs (which would re-read
        # data/idx K times).
        cap = int(2.5 * 2**20) // max(H * self.block * 4, 1)
        cap = min(cap, 16, (4 * 2**20) // max(16 * self.w2, 1))
        if (jax.default_backend() == "tpu" and pltpu is not None
                and self.block % 128 == 0 and self.w2 % 1024 == 0
                and jnp.dtype(self.dtype) in _PALLAS_DTYPES
                and K >= 2 and cap >= 2):
            outs = [self._matmat_pallas(X[:, j: j + cap])
                    if min(cap, K - j) >= 2
                    else self._matvec_impl(X[:, j])[:, None]
                    for j in range(0, K, cap)]
            return jnp.concatenate(outs, axis=1)
        cols = [self._matvec_impl(X[:, j]) for j in range(K)]
        return jnp.stack(cols, axis=1)

    def matmat_k(self, Xk):
        """Y = A @ X for K-MAJOR lane stacks (K, m_pad) -> (K, n_pad):
        the batched-solve layout.  The fused kernel is internally
        K-major, so this path skips both relayouts the column-stack API
        pays (round-4 item 3)."""
        K = Xk.shape[0]
        need = self.m_chunks * self.w2
        if Xk.shape[1] < need:
            Xk = jnp.pad(Xk, ((0, 0), (0, need - Xk.shape[1])))
        elif Xk.shape[1] > need:
            Xk = Xk[:, :need]
        H = 2 * self.w2 // _LANES
        cap = int(2.5 * 2**20) // max(H * self.block * 4, 1)
        cap = min(cap, 16, (4 * 2**20) // max(16 * self.w2, 1))
        if (jax.default_backend() == "tpu" and pltpu is not None
                and self.block % 128 == 0 and self.w2 % 1024 == 0
                and jnp.dtype(self.dtype) in _PALLAS_DTYPES
                and K >= 2 and cap >= 2):
            outs = [self._matmat_pallas_k(Xk[j: j + cap])
                    if min(cap, K - j) >= 2
                    else self._matvec_impl(Xk[j])[None, :]
                    for j in range(0, K, cap)]
            return jnp.concatenate(outs, axis=0)
        return jnp.stack([self._matvec_impl(Xk[j]) for j in range(K)],
                         axis=0)

    def rmatmat_k(self, Xk):
        """A.T @ X for K-major lane stacks (K, n_pad) -> (K, m_pad) —
        zero transposes (the transpose kernel's input and output blocks
        are both lane-major)."""
        K = Xk.shape[0]
        H = 2 * self.w2 // _LANES
        cap = int(2.5 * 2**20) // max(H * self.block * 4, 1)
        cap = min(cap, 16,
                  (6 * 2**20) // max(self.m_chunks * self.w2 * 4, 1))
        if (jax.default_backend() == "tpu" and pltpu is not None
                and K >= 2 and cap >= 2 and self.block % 128 == 0
                and self.w2 % 1024 == 0
                and jnp.dtype(self.dtype) in _PALLAS_DTYPES):
            outs = [self._rmatmat_pallas_k(Xk[j: j + cap])
                    if min(cap, K - j) >= 2
                    else self._rmatvec_impl(Xk[j])[None, :]
                    for j in range(0, K, cap)]
            return jnp.concatenate(outs, axis=0)
        return jnp.stack([self._rmatvec_impl(Xk[j]) for j in range(K)],
                         axis=0)

    def _matmat_pallas(self, X, interpret=False):
        """Column-stack (m_pad, K) wrapper over the K-major kernel."""
        need = self.m_chunks * self.w2
        if X.shape[0] < need:
            X = jnp.pad(X, ((0, need - X.shape[0]), (0, 0)))
        elif X.shape[0] > need:
            X = X[:need]
        return self._matmat_pallas_k(X.T, interpret=interpret).T

    def _matmat_pallas_k(self, Xk, interpret=False):
        """Fused multi-RHS forward kernel: the v2 matvec geometry with K
        window stacks resident per grid step.  The lane one-hot is
        SHARED across lanes — stage 1 becomes one (K·H, 128)×(128,
        BLOCK) MXU contraction (larger and better-utilized than K
        separate (H, 128) dots), and data/idx HBM traffic is paid once
        per block instead of once per block per RHS.  K-MAJOR
        (K, m_pad) in, (K, n_pad) out — Xk must arrive padded."""
        n_blocks, k, BLOCK = self.data.shape
        K = Xk.shape[0]
        H2 = self.w2 // _LANES
        H = 2 * H2
        X3 = Xk.reshape(K, self.m_chunks * H2, _LANES)
        dtype = self.data.dtype
        cdtype = jnp.float32 if dtype == jnp.bfloat16 else dtype

        def kernel(starts_ref, data_ref, idx_ref, xa_ref, xb_ref, y_ref):
            xw = jnp.concatenate([xa_ref[...], xb_ref[...]],
                                 axis=1)                      # (K, H, 128)
            xw2 = xw.reshape(K * H, _LANES).astype(cdtype)
            lane_iota = lax.broadcasted_iota(jnp.int32, (_LANES, BLOCK), 0)
            chunk_iota = lax.broadcasted_iota(jnp.int32, (H, BLOCK), 0)
            xws = _split3_bf16(xw2) if cdtype == jnp.float32 else None
            acc = jnp.zeros((K, BLOCK), dtype=cdtype)
            for s in range(k):                      # static unroll
                idx_s = idx_ref[0, s:s + 1, :]      # (1, BLOCK) packed
                hi_s = lax.shift_right_logical(idx_s, np.int32(7))
                lo_s = jnp.bitwise_and(idx_s, np.int32(127))
                if xws is not None:
                    OHl = (lane_iota == lo_s).astype(jnp.bfloat16)
                    C = sum(jnp.dot(p, OHl,
                                    preferred_element_type=jnp.float32)
                            for p in xws)                 # (K*H, BLOCK)
                else:
                    OHl = (lane_iota == lo_s).astype(cdtype)
                    C = jnp.dot(xw2, OHl, preferred_element_type=cdtype,
                                precision=lax.Precision.HIGHEST)
                C3 = C.reshape(K, H, BLOCK)
                sel = (chunk_iota == hi_s)                # (H, BLOCK)
                v = jnp.sum(jnp.where(sel[None, :, :], C3, 0), axis=1)
                acc = acc + v * data_ref[0, s:s + 1, :].astype(cdtype)
            y_ref[0] = acc.astype(dtype)

        z = np.int32(0)
        one = np.int32(1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((K, H2, _LANES), lambda b, s: (z, s[b], z)),
                pl.BlockSpec((K, H2, _LANES),
                             lambda b, s: (z, s[b] + one, z)),
            ],
            out_specs=pl.BlockSpec((1, K, BLOCK), lambda b, s: (b, z, z)),
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_blocks, K, BLOCK), dtype),
            interpret=interpret,
        )(self.starts, self.data, self.idx, X3, X3)
        return jnp.moveaxis(y, 0, 1).reshape(K, -1)

    def rmatmat(self, X):
        """A.T @ X: fused K-lane transpose kernel on TPU when the K
        transposed outputs fit VMEM; per-column unroll otherwise."""
        K = X.shape[1]
        H = 2 * self.w2 // _LANES
        # lane cap, same VMEM reasoning as matmat: Amat (K*H, BLOCK) f32
        # plus the K resident transposed outputs (K * m_pad * 4 bytes).
        # Output budget 6 MB so the 4.2M-row SA tentative operator
        # (2.8 MB transposed output) still runs 2 lanes fused — at cap 1
        # the batched restriction re-read data/idx once per lane.
        cap = int(2.5 * 2**20) // max(H * self.block * 4, 1)
        cap = min(cap, 16,
                  (6 * 2**20) // max(self.m_chunks * self.w2 * 4, 1))
        if (jax.default_backend() == "tpu" and pltpu is not None
                and K >= 2 and cap >= 2 and self.block % 128 == 0
                and self.w2 % 1024 == 0
                and jnp.dtype(self.dtype) in _PALLAS_DTYPES):
            outs = [self._rmatmat_pallas(X[:, j: j + cap])
                    if min(cap, K - j) >= 2
                    else self._rmatvec_impl(X[:, j])[:, None]
                    for j in range(0, K, cap)]
            return jnp.concatenate(outs, axis=1)
        cols = [self._rmatvec_impl(X[:, j]) for j in range(K)]
        return jnp.stack(cols, axis=1)

    def _rmatmat_pallas(self, X, interpret=False):
        """Column-stack (n_pad, K) wrapper over the K-major kernel."""
        return self._rmatmat_pallas_k(X[: self.n_pad].T,
                                      interpret=interpret).T

    def _rmatmat_pallas_k(self, Xk, interpret=False):
        """Fused K-lane transpose apply: the _rmatvec_pallas geometry
        with all K transposed outputs resident in VMEM; data/idx read
        once per row block for every lane, and the stage-1 contraction
        grows to (K·H, BLOCK)×(BLOCK, 128) on the MXU.  K-MAJOR
        (K, n_pad) in, (K, m_pad) out — both ends relayout-free."""
        n_blocks, k, BLOCK = self.data.shape
        K = Xk.shape[0]
        H2 = self.w2 // _LANES
        H = 2 * H2
        out_chunks = self.m_chunks * H2
        dtype = self.data.dtype
        cdtype = jnp.float32 if dtype == jnp.bfloat16 else dtype
        r3 = Xk[:, : self.n_pad].reshape(K, n_blocks, 1, BLOCK)

        def kernel(starts_ref, data_ref, idx_ref, r_ref, y_ref):
            b = pl.program_id(0)

            @pl.when(b == 0)
            def _init():
                y_ref[...] = jnp.zeros_like(y_ref)

            rb = r_ref[:, 0].astype(cdtype)                # (K, 1, BLOCK)
            lane_iota = lax.broadcasted_iota(jnp.int32, (_LANES, BLOCK), 0)
            chunk_iota = lax.broadcasted_iota(jnp.int32, (1, H, BLOCK), 1)
            acc = jnp.zeros((K * H, _LANES), dtype=cdtype)
            dims = (((1,), (1,)), ((), ()))
            for s in range(k):
                idx_s = idx_ref[0, s:s + 1, :]
                hi_s = lax.shift_right_logical(idx_s, np.int32(7))
                lo_s = jnp.bitwise_and(idx_s, np.int32(127))
                w = data_ref[0, s:s + 1, :].astype(cdtype) * rb  # (K,1,BLOCK)
                if cdtype == jnp.float32:
                    Bmat = (lane_iota == lo_s).astype(jnp.bfloat16)
                    for p in _split3_bf16(w):
                        Amat = jnp.where(
                            chunk_iota == hi_s[None],
                            p.astype(jnp.float32), 0.0
                        ).astype(jnp.bfloat16).reshape(K * H, BLOCK)
                        acc = acc + lax.dot_general(
                            Amat, Bmat, dims,
                            preferred_element_type=jnp.float32)
                else:
                    Amat = jnp.where(chunk_iota == hi_s[None], w,
                                     0).reshape(K * H, BLOCK)
                    Bmat = (lane_iota == lo_s).astype(cdtype)
                    acc = acc + lax.dot_general(
                        Amat, Bmat, dims,
                        preferred_element_type=cdtype,
                        precision=lax.Precision.HIGHEST)
            start = starts_ref[b]
            sl = pl.ds(start * H2, H)
            y_ref[:, sl, :] = (y_ref[:, sl, :]
                               + acc.reshape(K, H, _LANES).astype(dtype))

        z = np.int32(0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((1, k, BLOCK), lambda b, s: (b, z, z)),
                pl.BlockSpec((K, 1, 1, BLOCK), lambda b, s: (z, b, z, z)),
            ],
            out_specs=pl.BlockSpec((K, out_chunks, _LANES),
                                   lambda b, s: (z, z, z)),
        )
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((K, out_chunks, _LANES), dtype),
            interpret=interpret,
        )(self.starts, self.data, self.idx, r3)
        return y.reshape(K, -1)

    def __matmul__(self, x):
        if x.ndim != 1:
            return self.matmat(x)
        return self.matvec(x)

    def diagonal(self):
        gidx = (self.starts[:, None, None] * self.w2
                + self.idx)                            # (n_blocks, k, BLOCK)
        rows = jnp.arange(self.n_pad).reshape(self.data.shape[0], 1,
                                              self.block)
        return jnp.sum(jnp.where(gidx == rows, self.data, 0), axis=1).reshape(-1)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class TransposedWindowed:
    """Lazy transpose of a WindowedELL: ``matvec`` is the base operator's
    transpose apply.

    The device form of restriction operators (round 2): R is stored as
    windowed(R^T) — a fine-rows x coarse-cols operator with the
    PROLONGATOR's narrow windows — and applied backwards through the
    Pallas transpose kernel.  When R == P^T exactly (symmetric SA /
    classical), the wrapper shares P's arrays outright (half the device
    uploads).  Reference counterpart: scipy ``P.T @ r`` inside
    MultilevelSolver.__solve (SURVEY.md §2.1)."""

    base: WindowedELL

    def tree_flatten(self):
        return (self.base,), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        (base,) = children
        return cls(base=children[0])

    @property
    def shape(self):
        return (self.base.shape[1], self.base.shape[0])

    @property
    def nnz(self):
        return self.base.nnz

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def n_pad(self):
        return self.base.m_chunks * self.base.w2

    def matvec(self, x):
        need = self.base.n_pad
        if x.shape[0] < need:
            x = jnp.pad(x, (0, need - x.shape[0]))
        elif x.shape[0] > need:
            x = x[:need]
        return self.base.rmatvec(x)

    def rmatvec(self, x):
        return self.base.matvec(x)

    def matmat(self, X):
        """R @ X routed through the fused K-lane transpose kernel (the
        per-column unroll re-read the base operator once per lane —
        round-4 item 3)."""
        need = self.base.n_pad
        if X.shape[0] < need:
            X = jnp.pad(X, ((0, need - X.shape[0]), (0, 0)))
        elif X.shape[0] > need:
            X = X[:need]
        return self.base.rmatmat(X)

    def __matmul__(self, x):
        if x.ndim != 1:
            return self.matmat(x)
        return self.matvec(x)


# ---------------------------------------------------------------------------
# custom_vmap entry points (see sparse/dia.py): batched multi-RHS solves
# vmap the solve program over the RHS axis; these rules reroute per-lane
# windowed applies to the per-column matmat/rmatmat unrolls so the Pallas
# kernels are never traced under a vmap transform.
# ---------------------------------------------------------------------------

def _cv_unbatched_operator(in_batched_A):
    if any(jax.tree_util.tree_leaves(in_batched_A)):
        raise NotImplementedError(
            "vmap over the windowed operator itself is not supported; "
            "only the vector operand may be batched")


@jax.custom_batching.custom_vmap
def _windowed_matvec_cv(A, x):
    return A._matvec_impl(x)


@_windowed_matvec_cv.def_vmap
def _windowed_matvec_rule(axis_size, in_batched, A, x):
    del axis_size
    A_b, x_b = in_batched
    _cv_unbatched_operator(A_b)
    assert x_b, "rule invoked with no batched operand"
    # batch axis leads (K, m_pad) — the kernels' native lane-major
    # layout; no moveaxis/transpose (round-4 item 3)
    return A.matmat_k(x), True


@jax.custom_batching.custom_vmap
def _windowed_rmatvec_cv(A, x):
    return A._rmatvec_impl(x)


@_windowed_rmatvec_cv.def_vmap
def _windowed_rmatvec_rule(axis_size, in_batched, A, x):
    del axis_size
    A_b, x_b = in_batched
    _cv_unbatched_operator(A_b)
    assert x_b, "rule invoked with no batched operand"
    return A.rmatmat_k(x), True


# ---------------------------------------------------------------------------
# complex transfer operators: re/im split over REAL windowed kernels
# ---------------------------------------------------------------------------

def _cdtype_of(re_dtype):
    return (jnp.complex64 if jnp.dtype(re_dtype) == jnp.float32
            else jnp.complex128)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ComplexWindowed:
    """Re/im-split complex windowed operator (round 4, VERDICT item 9).

    The Pallas one-hot kernels are real-only (Mosaic has no complex
    vectors), so a complex transfer operator A = Ar + i*Ai is stored as
    two REAL WindowedELL parts sharing ONE geometry (same idx/starts
    device buffers — the split happens after conversion, so patterns
    match structurally) and applied with four real kernel passes:

        A @ x = (Ar xr - Ai xi) + i (Ar xi + Ai xr).

    This keeps gauge-Laplacian-class hierarchies (SURVEY.md §2.3
    gallery, complex Hermitian) on the fast gather-free device path.
    Reference counterpart: scipy complex csr_matvec (SURVEY.md §3.2)."""

    re: WindowedELL
    im: WindowedELL

    def tree_flatten(self):
        return (self.re, self.im), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(re=children[0], im=children[1])

    @property
    def shape(self):
        return self.re.shape

    @property
    def nnz(self):
        return self.re.nnz

    @property
    def n_pad(self):
        return self.re.n_pad

    @property
    def dtype(self):
        return _cdtype_of(self.re.dtype)

    def _can_transpose_pallas(self):
        return self.re._can_transpose_pallas()

    def matvec(self, x):
        xr, xi = jnp.real(x), jnp.imag(x)
        yr = self.re.matvec(xr) - self.im.matvec(xi)
        yi = self.re.matvec(xi) + self.im.matvec(xr)
        return lax.complex(yr, yi)

    def rmatvec(self, x):
        """A.T @ x (plain transpose — conjugation is the wrapper's job)."""
        xr, xi = jnp.real(x), jnp.imag(x)
        yr = self.re.rmatvec(xr) - self.im.rmatvec(xi)
        yi = self.re.rmatvec(xi) + self.im.rmatvec(xr)
        return lax.complex(yr, yi)

    def matmat(self, X):
        cols = [self.matvec(X[:, j]) for j in range(X.shape[1])]
        return jnp.stack(cols, axis=1)

    def __matmul__(self, x):
        if x.ndim != 1:
            return self.matmat(x)
        return self.matvec(x)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ComplexTransposedWindowed:
    """Lazy (conjugate-)transpose of a ComplexWindowed.

    The complex restriction form: R = P^H (hermitian hierarchies,
    ``conj=True``) or R = P^T (``conj=False``) applied backwards through
    the real Pallas transpose kernels, sharing P's device arrays —
    the complex analog of :class:`TransposedWindowed`.

        P^H x = (Ar^T xr + Ai^T xi) + i (Ar^T xi - Ai^T xr)
        P^T x = (Ar^T xr - Ai^T xi) + i (Ar^T xi + Ai^T xr)
    """

    base: ComplexWindowed
    conj: bool

    def tree_flatten(self):
        return (self.base,), (self.conj,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(base=children[0], conj=aux[0])

    @property
    def shape(self):
        return (self.base.shape[1], self.base.shape[0])

    @property
    def nnz(self):
        return self.base.nnz

    @property
    def dtype(self):
        return self.base.dtype

    @property
    def n_pad(self):
        return self.base.re.m_chunks * self.base.re.w2

    def matvec(self, x):
        need = self.base.n_pad
        if x.shape[0] < need:
            x = jnp.pad(x, (0, need - x.shape[0]))
        elif x.shape[0] > need:
            x = x[:need]
        xr, xi = jnp.real(x), jnp.imag(x)
        s = 1.0 if self.conj else -1.0   # P^H = Ar^T - i Ai^T
        yr = self.base.re.rmatvec(xr) + s * self.base.im.rmatvec(xi)
        yi = self.base.re.rmatvec(xi) - s * self.base.im.rmatvec(xr)
        return lax.complex(yr, yi)

    def matmat(self, X):
        cols = [self.matvec(X[:, j]) for j in range(X.shape[1])]
        return jnp.stack(cols, axis=1)

    def __matmul__(self, x):
        if x.ndim != 1:
            return self.matmat(x)
        return self.matvec(x)


def complex_windowed_from_scipy(A, dtype=jnp.complex64, block=None,
                                max_w2=16384):
    """Build a ComplexWindowed from a complex scipy sparse matrix.

    Converts ONCE on the full complex pattern (so both parts share
    geometry: block, w2, starts, idx), then splits the data into real
    WindowedELL parts.  Returns None when not windowable."""
    rdtype = (jnp.float32 if jnp.dtype(dtype) == jnp.complex64
              else jnp.float64)
    W = windowed_from_scipy(A, dtype=dtype, block=block, max_w2=max_w2)
    if W is None:
        return None

    def part(data):
        return WindowedELL(data=data, idx=W.idx, starts=W.starts,
                           shape=W.shape, block=W.block, w2=W.w2,
                           m_chunks=W.m_chunks, nnz=W.nnz)

    return ComplexWindowed(re=part(jnp.real(W.data).astype(rdtype)),
                           im=part(jnp.imag(W.data).astype(rdtype)))


def windowed_from_scipy(A, dtype=jnp.float32, block=None, max_w2=16384):
    """Build a WindowedELL from a scipy sparse matrix.

    ``block=None`` picks the row-block size adaptively: largest of
    (8192, ..., 256) that keeps the window at the Mosaic minimum
    (w2=1024), else the candidate minimizing the measured kernel cost
    model (grid-step overhead + one-hot MXU work ~ k*n*H; constants
    refit round 3 on the 4.2M-row k=1 SA tentative operator:
    ~0.15 us/grid step, ~8 ps per one-hot unit — large blocks win
    whenever the window doesn't grow with the block).

    Returns None when some row block's column span exceeds ``max_w2``
    (operator not windowable under the current ordering — caller should
    reorder or fall back).
    """
    candidates = ((8192, 4096, 2048, 1024, 512, 256) if block is None
                  else (int(block),))
    A = sp.csr_matrix(A)
    A.sort_indices()
    n, m = A.shape
    n_pad_max = pad_to(max(n, 1), max(candidates))
    lens = np.diff(A.indptr)
    k = max(int(lens.max()) if n else 0, 1)

    # dense padded (row, slot) -> col/val — staged ONCE at the largest
    # candidate padding (empty padding rows never affect window spans)
    rows = np.repeat(np.arange(n), lens)
    slots = np.arange(A.nnz) - np.repeat(A.indptr[:-1], lens)
    cols = np.zeros((n_pad_max, k), dtype=np.int64)
    host_dt = (np.complex128 if jnp.issubdtype(jnp.dtype(dtype),
                                               jnp.complexfloating)
               else np.float64)
    vals = np.zeros((n_pad_max, k), dtype=host_dt)
    has = np.zeros((n_pad_max, k), dtype=bool)
    if A.nnz:
        cols[rows, slots] = A.indices
        vals[rows, slots] = A.data
        has[rows, slots] = True

    # per-group min/max at the finest candidate granularity; larger
    # blocks reduce over these groups (no re-staging per candidate)
    GR = min(candidates)
    g = n_pad_max // GR
    g_min = np.where(has, cols, np.iinfo(np.int64).max).reshape(
        g, -1).min(axis=1)
    g_max = np.where(has, cols, -1).reshape(g, -1).max(axis=1)

    # pick (block, w2): largest block whose window stays at the Mosaic
    # minimum w2=1024, else minimize measured kernel cost (round-2 fit:
    # ~1.5 us grid-step overhead + ~15 ps per one-hot unit k*n_pad*H)
    best = None
    best_cost = None
    for blk in candidates:
        n_pad_c = pad_to(max(n, 1), blk)
        nb = n_pad_c // blk
        # per-grid-step VMEM guard: data+idx stream double-buffered
        if k * blk * 8 * 2 > 4 * 2**20:
            continue
        q = blk // GR
        gm = g_min[: n_pad_c // GR].reshape(nb, q).min(axis=1)
        gM = g_max[: n_pad_c // GR].reshape(nb, q).max(axis=1)
        empty = gM < 0
        gm[empty] = 0
        gM[empty] = 0
        # W2 must satisfy: for each block, span fits within 2*W2 when the
        # window starts at floor(min/W2)*W2.  Minimum 1024 = 8 sublanes
        # of 128 lanes (Mosaic tile constraint for the window blocks).
        w2_c = 1024
        while True:
            if (gM < (gm // w2_c + 2) * w2_c).all():
                break
            w2_c *= 2
            if w2_c > max_w2:
                w2_c = None
                break
        if w2_c is None:
            continue
        cost = nb * 0.15e-6 + k * n_pad_c * (2 * w2_c // _LANES) * 8e-12
        if best_cost is None or cost < best_cost:
            best = (blk, w2_c, n_pad_c, nb, gm)
            best_cost = cost
    if best is None:
        return None
    block, w2, n_pad, n_blocks, mins = best
    cols = cols[:n_pad]
    vals = vals[:n_pad]
    has = has[:n_pad]
    starts = mins // w2

    m_chunks = pad_to(max(m, 1), w2) // w2
    # starts+1 must be addressable
    m_chunks = max(m_chunks, int(starts.max()) + 2)

    local = cols - (starts[:, None] * w2).repeat(block, axis=0).reshape(n_pad, 1)
    local = np.where(has, local, 0)

    # ship the packed window-relative index (= chunk*128 + lane) as int16
    # — it fits (local < 2*max_w2 = 32768) and the relay upload is the
    # dominant cost of hierarchy compilation at multi-million rows; one
    # device-side cast widens to the kernel's int32.
    idx16 = local.reshape(n_blocks, block, k).transpose(0, 2, 1).astype(
        np.int16)
    idx = jnp.asarray(idx16).astype(jnp.int32)

    return WindowedELL(
        data=jnp.asarray(
            vals.reshape(n_blocks, block, k).transpose(0, 2, 1), dtype=dtype),
        idx=idx,
        starts=jnp.asarray(starts, dtype=jnp.int32),
        shape=(n, m),
        block=block,
        w2=int(w2),
        m_chunks=int(m_chunks),
        nnz=int(A.nnz),
    )
