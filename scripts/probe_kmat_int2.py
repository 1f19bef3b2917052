"""Interleaved K-major probe 2: chase the remaining DMA gap.

probe_kmat_interleave: int_full_b64k = 1.51 ms (~270 GB/s) vs 0.92 ms
bound; floor == full -> still DMA-bound.  Suspects: (a) scoped-VMEM cap
limits in-flight buffers (b128k OOMed at 21.5M > 16M), (b) the halo
specs' small DMAs, (c) per-buffer DMA overlap.

Variants (all K=8, interleaved (S, K, 128) layout, 2048x2176 grid):
  copy_b64k      pure copy kernel (1 in spec, 1 out) — pallas ceiling
  floor_nohalo   center + data only, B=65536
  floor_nodata   center + halos only, B=65536
  b128k_vm64     full kernel B=131072 with vmem_limit=64M
  b256k_vm96     full kernel B=262144 with vmem_limit=96M
  b64k_vm64      full kernel B=65536 with vmem_limit=64M (more buffers)

Writes /tmp/probe_kmat_int2.json.
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
kms = {}


def timed(name, fn, op, v, k=64):
    t = _chained_time(jax, jnp, fn, op, v, k=k)
    kms[name] = round(t * 1e3, 4)
    print(name, kms[name], flush=True)


def _halo_tiles(offsets):
    max_off = max(max(offsets), -min(offsets), 1)
    C = 8
    while C * 128 < max_off:
        C *= 2
    return C


def copy_kernel(o, Xi, B, vmem=None):
    R = B // 128
    nb = S // R

    def kernel(x_ref, y_ref):
        y_ref[...] = x_ref[...] * 1.000001

    kw = {}
    if vmem:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem)
    z = np.int32(0)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((R, K, 128), lambda b: (b, z, z))],
        out_specs=pl.BlockSpec((R, K, 128), lambda b: (b, z, z)),
        out_shape=jax.ShapeDtypeStruct((S, K, 128), jnp.float32),
        **kw,
    )(Xi)


def int_spmv(o, Xi, B, vmem=None, nohalo=False, nodata=False):
    data, offsets = o.data, o.offsets
    nd, n_pad = data.shape
    Kl = Xi.shape[1]
    R = B // 128
    nb = S // R
    C = _halo_tiles(offsets)
    Q = R // C
    data3 = data.reshape(nd, n_pad // 128, 128)
    floor = nohalo or nodata

    kw = {}
    if vmem:
        kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem)

    z = np.int32(0)
    one = np.int32(1)
    Q32 = np.int32(Q)
    last = np.int32(S // C - 1)

    specs = []
    if not nohalo:
        specs.append(pl.BlockSpec(
            (C, Kl, 128), lambda b: (jnp.maximum(b * Q32 - one, z), z, z)))
    specs.append(pl.BlockSpec((R, Kl, 128), lambda b: (b, z, z)))
    if not nohalo:
        specs.append(pl.BlockSpec(
            (C, Kl, 128),
            lambda b: (jnp.minimum(b * Q32 + Q32, last), z, z)))
    if not nodata:
        specs.append(pl.BlockSpec((nd, R, 128), lambda b: (z, b, z)))

    def kernel(*refs):
        y_ref = refs[-1]
        i = 0
        if not nohalo:
            xlo_ref, xc_ref, xhi_ref = refs[0], refs[1], refs[2]
            i = 3
        else:
            xc_ref = refs[0]
            i = 1
        d_ref = None if nodata else refs[i]
        if floor:
            acc = xc_ref[...] * 1.000001
            if not nohalo:
                acc = acc + xlo_ref[0, 0, 0] + xhi_ref[0, 0, 0]
            if not nodata:
                acc = acc * d_ref[0][:, None, :]
            y_ref[...] = acc
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

    inputs = []
    if not nohalo:
        inputs.append(Xi)
    inputs.append(Xi)
    if not nohalo:
        inputs.append(Xi)
    if not nodata:
        inputs.append(data3)
    y = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=specs,
        out_specs=pl.BlockSpec((R, Kl, 128), lambda b: (b, z, z)),
        out_shape=jax.ShapeDtypeStruct((S, Kl, 128), jnp.float32),
        **kw,
    )(*inputs)
    return y


Xi = jnp.ones((S, K, 128), dtype=jnp.float32)

timed("copy_b64k", functools.partial(copy_kernel, B=65536), A, Xi)
timed("copy_b256k_vm64", functools.partial(copy_kernel, B=262144,
                                           vmem=64 * 2**20), A, Xi)
timed("floor_nohalo", functools.partial(int_spmv, B=65536, nohalo=True),
      A, Xi)
timed("floor_nodata", functools.partial(int_spmv, B=65536, nodata=True),
      A, Xi)
timed("b64k_vm64", functools.partial(int_spmv, B=65536, vmem=64 * 2**20),
      A, Xi)
timed("b128k_vm64", functools.partial(int_spmv, B=131072,
                                      vmem=64 * 2**20), A, Xi)
timed("b256k_vm96", functools.partial(int_spmv, B=262144,
                                      vmem=96 * 2**20), A, Xi)

out["ms"] = kms
print(json.dumps(out), flush=True)
json.dump(out, open("/tmp/probe_kmat_int2.json", "w"), indent=1)
