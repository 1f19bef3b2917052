"""Probe the structured-transfer sub-ops at 4.2M on TPU (VERDICT item 4).

Times, chained: the 9-roll coarse broadcast vs reduce_window(3x3)
spread vs repeat-matmul; block_sum; the St SpMV; embed; and candidate
fused forms.  Writes /tmp/probe_transfer_ops.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _chained_time, _measure_rtt
from pyamg_tpu.engine.device_setup import (_block_sum, _broadcast_coarse,
                                           _embed_coarse)

out = {"backend": jax.default_backend()}
rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 2)
k = 128

cg = (683, 683)
stride = 3
fine = (2049, 2049)
nf = fine[0] * fine[1]
nc = cg[0] * cg[1]
xc = jnp.ones(nc, dtype=jnp.float32)
xf = jnp.ones(nf, dtype=jnp.float32)

# current: embed + 9 rolls
t = _chained_time(jax, jnp,
                  lambda o, v: _broadcast_coarse(v * 1.0000001, cg, stride, 1)[:nc],
                  None, xc, k=k)
out["broadcast_9roll_ms"] = round(t * 1e3, 4)

# candidate: embed (interior-pad dilation) + 3x3 stride-1 reduce_window
def bcast_rw(v):
    e = _embed_coarse(v, cg, stride, 1).reshape(fine)
    s = lax.reduce_window(e, jnp.zeros((), e.dtype), lax.add,
                          (3, 3), (1, 1), "SAME")
    return s.reshape(-1)

t = _chained_time(jax, jnp, lambda o, v: bcast_rw(v * 1.0000001)[:nc],
                  None, xc, k=k)
out["broadcast_reducewin_ms"] = round(t * 1e3, 4)

# candidate: per-dim repeat via one-hot MXU matmuls
R3y = (jnp.arange(fine[1])[:, None] // 3
       == jnp.arange(cg[1])[None, :]).astype(jnp.float32)   # (2049, 683)

def bcast_mm(v):
    x2 = v.reshape(cg)
    t1 = jnp.dot(x2, R3y.T, precision=lax.Precision.DEFAULT)  # (683, 2049)
    t2 = jnp.dot(R3y, t1, precision=lax.Precision.DEFAULT)    # (2049, 2049)
    return t2.reshape(-1)

t = _chained_time(jax, jnp, lambda o, v: bcast_mm(v * 1.0000001)[:nc],
                  None, xc, k=k)
out["broadcast_matmul_ms"] = round(t * 1e3, 4)

# embed alone
t = _chained_time(jax, jnp,
                  lambda o, v: _embed_coarse(v * 1.0000001, cg, stride, 1)[:nc],
                  None, xc, k=k)
out["embed_ms"] = round(t * 1e3, 4)

# block_sum (reduce_window stride 3)
t = _chained_time(jax, jnp,
                  lambda o, v: jnp.pad(_block_sum(v * 1.0000001, cg, stride),
                                       (0, nf - nc)),
                  None, xf, k=k)
out["block_sum_ms"] = round(t * 1e3, 4)

# elementwise pass (tv multiply) for scale
t = _chained_time(jax, jnp, lambda o, v: v * 1.0000001, None, xf, k=k)
out["eltwise_fine_ms"] = round(t * 1e3, 4)

out["total_s"] = round(time.time(), 1)
with open("/tmp/probe_transfer_ops.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
