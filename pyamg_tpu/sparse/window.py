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

__all__ = ["WindowedELL", "windowed_from_scipy"]

_LANES = 128


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class WindowedELL:
    """Window-blocked ELL matrix (see module docstring)."""

    data: jnp.ndarray      # (n_blocks, k, BLOCK) f32 (k-major for lean VMEM)
    hi: jnp.ndarray        # (n_blocks, k, BLOCK) int32 chunk-in-window
    lo: jnp.ndarray        # (n_blocks, k, BLOCK) int32 lane-in-chunk
    starts: jnp.ndarray    # (n_blocks,) int32, window start in W2 units
    shape: Tuple[int, int]
    block: int             # rows per block (static)
    w2: int                # half-window in elements, multiple of 128
    m_chunks: int          # padded source length in W2 units (static)
    nnz: int

    def tree_flatten(self):
        return (self.data, self.hi, self.lo, self.starts), (
            self.shape, self.block, self.w2, self.m_chunks, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        data, hi, lo, starts = children
        shape, block, w2, m_chunks, nnz = aux
        return cls(data=data, hi=hi, lo=lo, starts=starts, shape=shape,
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
        if (jax.default_backend() == "tpu" and pltpu is not None
                and self.block % 128 == 0 and self.w2 % 1024 == 0):
            return self._matvec_pallas(x)
        return self._matvec_reference(x)

    def _matvec_reference(self, x):
        """Gather-based fallback (CPU tests; NEVER traced on TPU)."""
        x = self._x_padded(x)
        gidx = (self.starts[:, None, None] * self.w2
                + self.hi * _LANES + self.lo)          # (n_blocks, k, BLOCK)
        vals = jnp.take(x, gidx, axis=0)
        return jnp.sum(self.data * vals, axis=1).reshape(-1)

    def _matvec_pallas(self, x):
        x = self._x_padded(x)
        n_blocks, k, BLOCK = self.data.shape
        H2 = self.w2 // _LANES           # chunks per half-window
        H = 2 * H2
        x2 = x.reshape(self.m_chunks * H2, _LANES)
        dtype = self.data.dtype

        # MXU accumulators must be 32-bit: compute in f32 even for bf16
        # operands, cast on the way out
        cdtype = jnp.float32 if dtype == jnp.bfloat16 else dtype

        def kernel(starts_ref, data_ref, hi_ref, lo_ref, xa_ref, xb_ref,
                   y_ref):
            xw = jnp.concatenate([xa_ref[...], xb_ref[...]],
                                 axis=0).astype(cdtype)               # (H,128)
            xwT = xw.T                                                # (128, H)
            chunk_iota = lax.broadcasted_iota(jnp.int32, (H, BLOCK), 0)
            lane_iota = lax.broadcasted_iota(jnp.int32, (_LANES, BLOCK), 0)

            def body(s, acc):
                hi_s = hi_ref[0, pl.ds(s, 1), :]       # (1, BLOCK)
                lo_s = lo_ref[0, pl.ds(s, 1), :]
                dat_s = data_ref[0, pl.ds(s, 1), :]
                # stage 1 (MXU): one-hot chunk selection; HIGHEST precision
                # because the MXU's default bf16 passes would round x
                OH = (chunk_iota == hi_s).astype(cdtype)           # (H, BLOCK)
                C = jnp.dot(xwT, OH, preferred_element_type=cdtype,
                            precision=lax.Precision.HIGHEST)       # (128,BLOCK)
                # stage 2 (VPU): one-hot lane selection
                v = jnp.sum(jnp.where(lane_iota == lo_s, C, 0), axis=0,
                            keepdims=True)                          # (1, BLOCK)
                return acc + v * dat_s.astype(cdtype)

            acc = lax.fori_loop(0, k, body,
                                jnp.zeros((1, BLOCK), dtype=cdtype))
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
        )(self.starts, self.data, self.hi, self.lo, x2, x2)
        return y.reshape(-1)

    def rmatvec(self, x):
        """A.T @ x via scatter-add.

        CPU-grade fallback (an XLA scatter — off the TPU hot path, like
        _matvec_reference); exists so NE/NR smoothers stay traceable when
        a level operator is windowed rather than DIA/dense."""
        gidx = (self.starts[:, None, None] * self.w2
                + self.hi * _LANES + self.lo)          # (n_blocks, k, BLOCK)
        xb = x[: self.n_pad].reshape(self.data.shape[0], 1, self.block)
        y = jnp.zeros(self.m_chunks * self.w2, dtype=self.dtype)
        return y.at[gidx].add(self.data * xb)

    def matmat(self, X):
        """Y = A @ X for a padded column stack X (m_pad, k).

        Batched RHS go through per-column matvecs (static unroll): the
        Pallas kernel's window streaming is per-vector; XLA batches the
        resulting programs.  Covers the engine's batched-RHS solves."""
        cols = [self.matvec(X[:, j]) for j in range(X.shape[1])]
        return jnp.stack(cols, axis=1)

    def __matmul__(self, x):
        if x.ndim != 1:
            return self.matmat(x)
        return self.matvec(x)

    def diagonal(self):
        gidx = (self.starts[:, None, None] * self.w2
                + self.hi * _LANES + self.lo)          # (n_blocks, k, BLOCK)
        rows = jnp.arange(self.n_pad).reshape(self.data.shape[0], 1,
                                              self.block)
        return jnp.sum(jnp.where(gidx == rows, self.data, 0), axis=1).reshape(-1)


def windowed_from_scipy(A, dtype=jnp.float32, block=256, max_w2=16384):
    """Build a WindowedELL from a scipy sparse matrix.

    Returns None when some row block's column span exceeds ``max_w2``
    (operator not windowable under the current ordering — caller should
    reorder or fall back).
    """
    A = sp.csr_matrix(A)
    A.sort_indices()
    n, m = A.shape
    n_pad = pad_to(max(n, 1), block)
    n_blocks = n_pad // block
    lens = np.diff(A.indptr)
    k = max(int(lens.max()) if n else 0, 1)

    # dense padded (row, slot) -> col/val
    rows = np.repeat(np.arange(n), lens)
    slots = np.arange(A.nnz) - np.repeat(A.indptr[:-1], lens)
    cols = np.zeros((n_pad, k), dtype=np.int64)
    host_dt = (np.complex128 if jnp.issubdtype(jnp.dtype(dtype),
                                               jnp.complexfloating)
               else np.float64)
    vals = np.zeros((n_pad, k), dtype=host_dt)
    has = np.zeros((n_pad, k), dtype=bool)
    if A.nnz:
        cols[rows, slots] = A.indices
        vals[rows, slots] = A.data
        has[rows, slots] = True

    cols_b = cols.reshape(n_blocks, block, k)
    has_b = has.reshape(n_blocks, block, k)
    # per-block min/max over present entries
    big = np.where(has_b, cols_b, np.iinfo(np.int64).max)
    small = np.where(has_b, cols_b, -1)
    mins = big.reshape(n_blocks, -1).min(axis=1)
    maxs = small.reshape(n_blocks, -1).max(axis=1)
    empty = maxs < 0
    mins[empty] = 0
    maxs[empty] = 0

    # W2 must satisfy: for each block, span fits within 2*W2 when the
    # window starts at floor(min/W2)*W2.  Minimum 1024 = 8 sublanes of
    # 128 lanes (Mosaic tile constraint for the streamed window blocks).
    w2 = 1024
    while True:
        starts = mins // w2
        ok = (maxs < (starts + 2) * w2).all()
        if ok:
            break
        w2 *= 2
        if w2 > max_w2:
            return None

    m_chunks = pad_to(max(m, 1), w2) // w2
    # starts+1 must be addressable
    m_chunks = max(m_chunks, int(starts.max()) + 2)

    local = cols - (starts[:, None] * w2).repeat(block, axis=0).reshape(n_pad, 1)
    local = np.where(has, local, 0)
    hi = (local // _LANES).astype(np.int64)
    lo = (local % _LANES).astype(np.int64)

    return WindowedELL(
        data=jnp.asarray(
            vals.reshape(n_blocks, block, k).transpose(0, 2, 1), dtype=dtype),
        hi=jnp.asarray(
            hi.reshape(n_blocks, block, k).transpose(0, 2, 1),
            dtype=jnp.int32),
        lo=jnp.asarray(
            lo.reshape(n_blocks, block, k).transpose(0, 2, 1),
            dtype=jnp.int32),
        starts=jnp.asarray(starts, dtype=jnp.int32),
        shape=(n, m),
        block=block,
        w2=int(w2),
        m_chunks=int(m_chunks),
        nnz=int(A.nnz),
    )
