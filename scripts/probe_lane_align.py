"""A/B the lane-aligned padded grid (round 4): single V-cycle + K=8
batched V-cycle on the device-built 2048^2 SA hierarchy with and
without last-dim 128-alignment.  Writes /tmp/probe_lane_align.json."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _chained_time, _measure_rtt
import pyamg_tpu.engine.device_setup as ds
from pyamg_tpu.engine import device_sa_setup
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.sparse import dia_from_stencil

out = {"backend": jax.default_backend(),
       "rtt_ms": round(_measure_rtt(jax, jnp) * 1e3, 2)}
grid = (2048, 2048)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A_dia = dia_from_stencil(S1, grid, dtype=jnp.float32)
K = 8

for align in (False, True):
    tag = "align" if align else "plain"
    dsa = device_sa_setup(A_dia, grid=grid, dtype=jnp.float32,
                          max_coarse=400, lane_align=align)
    float(dsa.hierarchy.coarse_inv[0, 0])
    h = dsa.hierarchy
    out[f"{tag}_levels"] = [int(l.n_pad) for l in h.levels]
    oc = _make_cycle(len(h.levels), "V")
    b0 = jnp.ones(h.levels[0].n_pad, dtype=jnp.float32)
    t = _chained_time(jax, jnp,
                      lambda o, v: oc(o, jnp.zeros_like(v), v), h, b0,
                      k=64)
    out[f"{tag}_vcycle_ms"] = round(t * 1e3, 3)
    tz = _chained_time(jax, jnp, lambda o, v: oc.zero(o, v), h, b0,
                       k=64)
    out[f"{tag}_vcycle_zero_ms"] = round(tz * 1e3, 3)
    bK = jnp.ones((K, h.levels[0].n_pad), dtype=jnp.float32)
    ocb = jax.vmap(lambda o, v: oc.zero(o, v), in_axes=(None, 0))
    tK = _chained_time(jax, jnp, ocb, h, bK, k=32)
    out[f"{tag}_vcycle_K8_ms"] = round(tK * 1e3, 3)
    out[f"{tag}_K8_per_rhs_ms"] = round(tK / K * 1e3, 3)
    out[f"{tag}_K8_amort"] = round(tz * K / tK, 2)
    # convergence sanity: same iteration count both ways
    b = jnp.asarray(np.random.default_rng(0).random(grid[0] * grid[1]),
                    dtype=jnp.float32)
    res = []
    dsa.solve(b, tol=1e-5, maxiter=40, accel="cg", residuals=res)
    res = [r for r in np.asarray(res) if not np.isnan(r)]
    out[f"{tag}_cg_iters"] = len(res) - 1

ds._LANE_ALIGN_DEFAULT = False
with open("/tmp/probe_lane_align.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
