"""K-lane fused DIA matmat variants (VERDICT item 3: the K=8 kernel
measures ~2.4 ms at 4.78M/5-diag where the traffic bound is ~1.2 ms).

Variants, all chained-timed on the real chip:
  xla     rolled K-major fallback (traffic ~nd passes over X)
  cur     current _dia_pallas_matmat_k (3-D blocks, per-diag roll+where)
  b64k    same kernel forced B=65536 (VMEM budget bump)
  dma     DMA floor: same BlockSpecs, body = center*data[0] only
          (no shifts) -> the pure traffic time of this block pattern
  gridk   grid=(nb, K): single-RHS 2-D kernel body per lane; the data
          block index map ignores k so Mosaic fetches it once per b
  forik   3-D blocks, in-kernel fori_loop over lanes with 2-D slices

Writes /tmp/probe_kmat.json.  Run detached; exits cleanly.
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
from pyamg_tpu.sparse.dia import (
    _dia_pallas_matmat_k, _fused_block_k, _halo_chunks, _dia_shifted,
    _dia_shifted_k)
import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu

out = {"backend": jax.default_backend()}
rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 3)

# lane-aligned 2048^2 grid -> period 2176, n_pad 4784128 (the batched
# bench layout; see probe_lane_align)
grid = (2048, 2176)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A = dia_from_stencil(S1, grid, dtype=jnp.float32)
n_pad = A.n_pad
K = 8
out["n_pad"] = int(n_pad)
out["offsets"] = list(map(int, A.offsets))
Xk = jnp.ones((K, n_pad), dtype=jnp.float32)

kms = {}


def timed(name, fn, k=64):
    t = _chained_time(jax, jnp, fn, A, Xk, k=k)
    kms[name] = round(t * 1e3, 4)
    print(name, kms[name], flush=True)


# -- xla rolled fallback ------------------------------------------------
def xla_roll(o, Xk):
    Y = o.data[0][None, :] * jnp.roll(Xk, -o.offsets[0], axis=1)
    for d in range(1, len(o.offsets)):
        Y = Y + o.data[d][None, :] * jnp.roll(Xk, -o.offsets[d], axis=1)
    return Y


# -- current kernel -----------------------------------------------------
def cur(o, Xk, B):
    return _dia_pallas_matmat_k(o.data, o.offsets, Xk, B)


# -- dma floor: same specs, no shift work -------------------------------
def dma_floor(o, Xk, B):
    data, offsets = o.data, o.offsets
    nd, n_pad = data.shape
    Kl = Xk.shape[0]
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R, 8)
    Q = R // C
    x3 = Xk.reshape(Kl, -1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)

    def kernel(xlo_ref, xc_ref, xhi_ref, d_ref, y_ref):
        acc = xc_ref[...] * d_ref[0][None]
        acc = acc + xlo_ref[0, 0, 0] + xhi_ref[0, 0, 0]
        y_ref[...] = acc

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Kl, C, 128),
                         lambda b: (z, jnp.maximum(b * Q32 - one, z), z)),
            pl.BlockSpec((Kl, R, 128), lambda b: (z, b, z)),
            pl.BlockSpec((Kl, C, 128),
                         lambda b: (z, jnp.minimum(b * Q32 + Q32, last),
                                    z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
        ],
        out_specs=pl.BlockSpec((Kl, R, 128), lambda b: (z, b, z)),
        out_shape=jax.ShapeDtypeStruct((Kl, n_pad // 128, 128),
                                       jnp.float32),
    )(x3, x3, x3, data3)
    return y.reshape(Kl, -1)


# -- gridk: (nb, K) grid, 2-D single-RHS body ---------------------------
def gridk(o, Xk, B):
    data, offsets = o.data, o.offsets
    nd, n_pad = data.shape
    Kl = Xk.shape[0]
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R, 8)
    Q = R // C
    x3 = Xk.reshape(Kl, -1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)

    def kernel(xlo_ref, xc_ref, xhi_ref, d_ref, y_ref):
        xcat = jnp.concatenate(
            [xlo_ref[0], xc_ref[0], xhi_ref[0]], axis=0)
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        acc = jnp.zeros((R, 128), dtype=jnp.float32)
        for d, off in enumerate(offsets):
            sh = _dia_shifted(xcat, off, C * 128, R, lane)
            acc = acc + d_ref[d] * sh
        y_ref[0] = acc

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    y = pl.pallas_call(
        kernel,
        grid=(nb, Kl),
        in_specs=[
            pl.BlockSpec((1, C, 128),
                         lambda b, k: (k, jnp.maximum(b * Q32 - one, z),
                                       z)),
            pl.BlockSpec((1, R, 128), lambda b, k: (k, b, z)),
            pl.BlockSpec((1, C, 128),
                         lambda b, k: (k, jnp.minimum(b * Q32 + Q32, last),
                                       z)),
            pl.BlockSpec((nd, R, 128), lambda b, k: (z, b, z)),
        ],
        out_specs=pl.BlockSpec((1, R, 128), lambda b, k: (k, b, z)),
        out_shape=jax.ShapeDtypeStruct((Kl, n_pad // 128, 128),
                                       jnp.float32),
    )(x3, x3, x3, data3)
    return y.reshape(Kl, -1)


# -- forik: 3-D blocks, fori over lanes in-kernel -----------------------
def forik(o, Xk, B):
    data, offsets = o.data, o.offsets
    nd, n_pad = data.shape
    Kl = Xk.shape[0]
    nb = n_pad // B
    R = B // 128
    C = _halo_chunks(offsets, R, 8)
    Q = R // C
    x3 = Xk.reshape(Kl, -1, 128)
    data3 = data.reshape(nd, n_pad // 128, 128)

    def kernel(xlo_ref, xc_ref, xhi_ref, d_ref, y_ref):
        lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)

        def body(k, _):
            xcat = jnp.concatenate(
                [xlo_ref[k], xc_ref[k], xhi_ref[k]], axis=0)
            acc = jnp.zeros((R, 128), dtype=jnp.float32)
            for d, off in enumerate(offsets):
                sh = _dia_shifted(xcat, off, C * 128, R, lane)
                acc = acc + d_ref[d] * sh
            y_ref[k] = acc
            return 0

        lax.fori_loop(0, Kl, body, 0)

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(n_pad // (C * 128) - 1)
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Kl, C, 128),
                         lambda b: (z, jnp.maximum(b * Q32 - one, z), z)),
            pl.BlockSpec((Kl, R, 128), lambda b: (z, b, z)),
            pl.BlockSpec((Kl, C, 128),
                         lambda b: (z, jnp.minimum(b * Q32 + Q32, last),
                                    z)),
            pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)),
        ],
        out_specs=pl.BlockSpec((Kl, R, 128), lambda b: (z, b, z)),
        out_shape=jax.ShapeDtypeStruct((Kl, n_pad // 128, 128),
                                       jnp.float32),
    )(x3, x3, x3, data3)
    return y.reshape(Kl, -1)


B0 = _fused_block_k(A.data, A.offsets, Xk.T, K)
out["B_default"] = int(B0) if B0 else None

# correctness check (vs the rolled form) at small scale first
ref = np.asarray(jax.jit(xla_roll)(A, Xk))
for nm, fn in [("cur", cur), ("dma", None), ("gridk", gridk),
               ("forik", forik)]:
    if fn is None:
        continue
    got = np.asarray(jax.jit(functools.partial(fn, B=B0))(A, Xk))
    err = float(np.max(np.abs(got - ref)) / np.max(np.abs(ref)))
    out[f"err_{nm}"] = err
    assert err < 1e-6, (nm, err)
print("correctness ok", flush=True)

timed("xla", xla_roll, k=16)
timed("cur", functools.partial(cur, B=B0))
if n_pad % 65536 == 0:
    timed("cur_b64k", functools.partial(cur, B=65536))
    timed("gridk_b64k", functools.partial(gridk, B=65536))
timed("dma", functools.partial(dma_floor, B=B0))
timed("gridk", functools.partial(gridk, B=B0))
timed("forik", functools.partial(forik, B=B0))
if n_pad % 16384 == 0:
    timed("gridk_b16k", functools.partial(gridk, B=16384))

out["ms"] = kms
# traffic bound: x K*(n+2C*128*nb) + data nd*n + y K*n floats
nd = A.data.shape[0]
traffic_mb = (K * n_pad + nd * n_pad + K * n_pad) * 4 / 1e6
out["min_traffic_mb"] = round(traffic_mb, 1)
out["bound_ms_at_405"] = round(traffic_mb / 405.1, 3)
print(json.dumps(out), flush=True)
json.dump(out, open("/tmp/probe_kmat.json", "w"), indent=1)
