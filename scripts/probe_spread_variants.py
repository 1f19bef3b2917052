"""Batched (K=8) block_sum/broadcast variant shoot-out at 4.2M.
Writes /tmp/probe_spread_variants.json."""
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
from pyamg_tpu.sparse.window import _split3_bf16

out = {"backend": jax.default_backend(),
       "rtt_ms": round(_measure_rtt(jax, jnp) * 1e3, 2)}
K = 8
cgx = cgy = 683
s = 3
fgx, fgy = cgx * s, cgy * s
nf = fgx * fgy
nc = cgx * cgy

xfK = jnp.ones((K, nf), dtype=jnp.float32)
xcK = jnp.ones((K, nc), dtype=jnp.float32)

My = (jnp.arange(fgy)[:, None] // s == jnp.arange(cgy)[None, :]
      ).astype(jnp.float32)            # (fgy, cgy) spread one-hot


def bsum_tensordot(v):
    from pyamg_tpu.engine.device_setup import _block_sum
    return jax.vmap(lambda u: jnp.pad(_block_sum(u, (cgx, cgy), s),
                                      (0, nf - nc)))(v)


def bsum_strided_mm(v):
    v3 = v.reshape(K, fgx, fgy)
    vx = v3[:, 0::s] + v3[:, 1::s] + v3[:, 2::s]     # (K, cgx, fgy)
    acc = None
    for p in _split3_bf16(vx):
        t = jnp.einsum("kxf,fc->kxc", p, My.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t
    return jnp.pad(acc.reshape(K, -1), ((0, 0), (0, nf - nc)))


def bsum_strided_both(v):
    v3 = v.reshape(K, fgx, fgy)
    vx = v3[:, 0::s] + v3[:, 1::s] + v3[:, 2::s]
    vy = vx[:, :, 0::s] + vx[:, :, 1::s] + vx[:, :, 2::s]
    return jnp.pad(vy.reshape(K, -1), ((0, 0), (0, nf - nc)))


def bcast_tensordot(v):
    from pyamg_tpu.engine.device_setup import _broadcast_coarse
    return jax.vmap(lambda u: _broadcast_coarse(u, (cgx, cgy), s,
                                                1)[:nc])(v)


def bcast_mm_repeat(v):
    v3 = v.reshape(K, cgx, cgy)
    acc = None
    for p in _split3_bf16(v3):
        t = jnp.einsum("kxc,fc->kxf", p, My.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
        acc = t if acc is None else acc + t       # (K, cgx, fgy)
    outx = jnp.repeat(acc, s, axis=1)             # (K, fgx, fgy)
    return outx.reshape(K, -1)[:, :nc]


def bcast_repeat_both(v):
    v3 = v.reshape(K, cgx, cgy)
    o = jnp.repeat(jnp.repeat(v3, s, axis=1), s, axis=2)
    return o.reshape(K, -1)[:, :nc]


for name, f, arg in [
    ("bsum_tensordot", bsum_tensordot, xfK),
    ("bsum_strided_mm", bsum_strided_mm, xfK),
    ("bsum_strided_both", bsum_strided_both, xfK),
    ("bcast_tensordot", bcast_tensordot, xcK),
    ("bcast_mm_repeat", bcast_mm_repeat, xcK),
    ("bcast_repeat_both", bcast_repeat_both, xcK),
]:
    t = _chained_time(jax, jnp, lambda o, v: f(v * 1.0000001), None,
                      arg, k=32)
    out[f"{name}_K8_ms"] = round(t * 1e3, 4)

with open("/tmp/probe_spread_variants.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
