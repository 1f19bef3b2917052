"""Is flat->(2049,2049) reshape the hidden grid-op cost?  Compare
eltwise chains with/without the 2-D roundtrip, and 2304-wide (tile-
aligned) vs 2049-wide grids.  Writes /tmp/probe_reshape_cost.json."""
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

out = {"backend": jax.default_backend(),
       "rtt_ms": round(_measure_rtt(jax, jnp) * 1e3, 2)}

for W, tag in [(2049, "2049"), (2304, "2304")]:
    H = 2049 if W == 2049 else 2052
    nf = H * W
    v1 = jnp.ones(nf, dtype=jnp.float32)
    vK = jnp.ones((8, nf), dtype=jnp.float32)

    def flat1(o, v):
        return v * 1.0000001

    def rt1(o, v):
        return (v.reshape(H, W) * 1.0000001).reshape(-1)

    def rs_sum1(o, v):
        v2 = v.reshape(H, W)
        sx = v2[0::3] + v2[1::3] + v2[2::3]
        return jnp.pad(sx.reshape(-1), (0, nf - sx.size)) + v * 0

    t = _chained_time(jax, jnp, flat1, None, v1, k=64)
    out[f"flat_{tag}_1_ms"] = round(t * 1e3, 4)
    t = _chained_time(jax, jnp, rt1, None, v1, k=64)
    out[f"roundtrip_{tag}_1_ms"] = round(t * 1e3, 4)
    t = _chained_time(jax, jnp, rs_sum1, None, v1, k=64)
    out[f"stridedsum_{tag}_1_ms"] = round(t * 1e3, 4)

    t = _chained_time(jax, jnp, jax.vmap(lambda v: v * 1.0000001,
                                         ).__call__ if False else
                      (lambda o, v: v * 1.0000001), None, vK, k=32)
    out[f"flat_{tag}_K8_ms"] = round(t * 1e3, 4)
    t = _chained_time(jax, jnp,
                      lambda o, v: (v.reshape(8, H, W)
                                    * 1.0000001).reshape(8, -1),
                      None, vK, k=32)
    out[f"roundtrip_{tag}_K8_ms"] = round(t * 1e3, 4)

    def rs_sumK(o, v):
        v3 = v.reshape(8, H, W)
        sx = v3[:, 0::3] + v3[:, 1::3] + v3[:, 2::3]
        return jnp.pad(sx.reshape(8, -1),
                       ((0, 0), (0, nf - sx.shape[1] * sx.shape[2]))) \
            + v * 0

    t = _chained_time(jax, jnp, rs_sumK, None, vK, k=32)
    out[f"stridedsum_{tag}_K8_ms"] = round(t * 1e3, 4)

with open("/tmp/probe_reshape_cost.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
