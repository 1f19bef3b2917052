"""Interleaved K-major layout probe (round 4, VERDICT item 3).

probe_kmat_variants found the K-lane fused DIA matmat is DMA-bound:
the no-compute floor of the (K, R, 128) strided block pattern is
1.94 ms at 4.46M/K=8 (~211 GB/s) — half the measured triad rate —
identical to the full kernel (1.98 ms).  Hypothesis: per-lane strided
segments halve DMA efficiency.

Fix under test: store lane stacks INTERLEAVED as (S, K, 128) with
S = n_pad/128 chunks — each (K=8, 128) tile is one 128-lane chunk of
all K lanes, so a (R, K, 128) block is FULLY CONTIGUOUS in HBM and
diagonal shifts decompose as tile-granular chunk slices (free) + lane
rolls (no sublane-misaligned relayouts ever).

Variants:
  int_dma    DMA floor on the interleaved pattern
  int_full   full 5-diag SpMV on the interleaved layout
  to_int     cost of the (K, n) -> (S, K, 128) relayout (XLA transpose)
  k1_dma     K=1 floor of the old pattern (scaling reference)

Writes /tmp/probe_kmat_int.json.
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _chained_time, _measure_rtt
from pyamg_tpu.sparse import dia_from_stencil
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

out = {"backend": jax.default_backend()}
rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 3)

grid = (2048, 2176)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A = dia_from_stencil(S1, grid, dtype=jnp.float32)
n_pad = A.n_pad
K = 8
S = n_pad // 128
out["n_pad"] = int(n_pad)
kms = {}


def timed(name, fn, op, v, k=64):
    t = _chained_time(jax, jnp, fn, op, v, k=k)
    kms[name] = round(t * 1e3, 4)
    print(name, kms[name], flush=True)


def _halo_tiles(offsets):
    """Halo extent in (K,128) tiles: power of two >= max|off|/128."""
    max_off = max(max(offsets), -min(offsets), 1)
    C = 8
    while C * 128 < max_off:
        C *= 2
    return C


def int_spmv(o, Xi, B, floor_only=False):
    """y = A @ x on interleaved (S, K, 128) lane stacks."""
    data, offsets = o.data, o.offsets
    nd, n_pad = data.shape
    Kl = Xi.shape[1]
    R = B // 128                 # tiles per block
    nb = (n_pad // 128) // R
    C = _halo_tiles(offsets)
    Q = R // C
    data3 = data.reshape(nd, n_pad // 128, 128)

    def kernel(xlo_ref, xc_ref, xhi_ref, d_ref, y_ref):
        if floor_only:
            y_ref[...] = xc_ref[...] * d_ref[0][:, None, :]
            return
        xcat = jnp.concatenate(
            [xlo_ref[...], xc_ref[...], xhi_ref[...]], axis=0)
        lane = lax.broadcasted_iota(jnp.int32, (R, 1, 128), 2)
        acc = jnp.zeros((R, Kl, 128), dtype=jnp.float32)
        for d, off in enumerate(offsets):
            q, r = divmod(C * 128 + off, 128)
            if r == 0:
                sh = xcat[q:q + R]
            else:
                t = xcat[q:q + R + 1]
                a = pltpu.roll(t, np.int32(128 - r), axis=2)
                sh = jnp.where(lane < 128 - r, a[:R], a[1:R + 1])
            acc = acc + d_ref[d][:, None, :] * sh
        y_ref[...] = acc

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32((n_pad // 128) // C - 1)
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((C, Kl, 128),
                         lambda b: (jnp.maximum(b * Q32 - one, z), z, z)),
            pl.BlockSpec((R, Kl, 128), lambda b: (b, z, z)),
            pl.BlockSpec((C, Kl, 128),
                         lambda b: (jnp.minimum(b * Q32 + Q32, last), z,
                                    z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
        ],
        out_specs=pl.BlockSpec((R, Kl, 128), lambda b: (b, z, z)),
        out_shape=jax.ShapeDtypeStruct((n_pad // 128, Kl, 128),
                                       jnp.float32),
    )(Xi, Xi, Xi, data3)
    return y


def to_interleaved(Xk):
    return jnp.moveaxis(Xk.reshape(Xk.shape[0], -1, 128), 0, 1)


def from_interleaved(Xi):
    return jnp.moveaxis(Xi, 1, 0).reshape(Xi.shape[1], -1)


Xk = jnp.ones((K, n_pad), dtype=jnp.float32) * (
    1.0 + jnp.arange(K, dtype=jnp.float32)[:, None] * 0.1)
Xk = Xk * (1.0 + 1e-7 * jnp.arange(n_pad, dtype=jnp.float32)[None, :])
Xi = jax.jit(to_interleaved)(Xk)

# correctness
def xla_roll(o, Xk):
    Y = o.data[0][None, :] * jnp.roll(Xk, -o.offsets[0], axis=1)
    for d in range(1, len(o.offsets)):
        Y = Y + o.data[d][None, :] * jnp.roll(Xk, -o.offsets[d], axis=1)
    return Y

ref = np.asarray(jax.jit(xla_roll)(A, Xk))
got = np.asarray(jax.jit(
    lambda o, v: from_interleaved(int_spmv(o, v, 32768)))(A, Xi))
err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
out["err_int"] = err
assert err < 1e-6, err
print("correctness ok", flush=True)

timed("int_dma", functools.partial(int_spmv, B=32768, floor_only=True),
      A, Xi)
timed("int_full", functools.partial(int_spmv, B=32768), A, Xi)
timed("int_full_b64k", functools.partial(int_spmv, B=65536), A, Xi)
timed("int_full_b128k", functools.partial(int_spmv, B=131072), A, Xi)

# relayout cost (round trip keeps shapes chained)
timed("roundtrip", lambda o, v: to_interleaved(from_interleaved(v)) * 1.0,
      A, Xi, k=32)

# K=1 floor of the OLD pattern for scaling reference
from pyamg_tpu.sparse.dia import _fused_block
x1 = jnp.ones((n_pad,), dtype=jnp.float32)
B1 = _fused_block(A.data, A.offsets, x1)
out["B1"] = int(B1) if B1 else None
from pyamg_tpu.sparse.dia import _dia_pallas_matvec
timed("k1_full", lambda o, v: _dia_pallas_matvec(o.data, o.offsets, v,
                                                 B1), A, x1, k=128)

out["ms"] = kms
traffic_mb = (2 * K * n_pad + 5 * n_pad) * 4 / 1e6
out["min_traffic_mb"] = round(traffic_mb, 1)
out["bound_ms_at_405"] = round(traffic_mb / 405.1, 3)
print(json.dumps(out), flush=True)
json.dump(out, open("/tmp/probe_kmat_int.json", "w"), indent=1)
