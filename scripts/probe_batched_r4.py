"""Re-measure batched K=8 V-cycle amortization after the K-major
rework (VERDICT item 3).  Round-3 numbers: vcycle_K8_amort 0.98x,
stage_R_amort 0.87x.  Target: >=3x per-RHS amortization.
Writes /tmp/probe_batched_r4.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _chained_time, _measure_rtt
from pyamg_tpu.engine import device_sa_setup
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.sparse import dia_from_stencil

out = {"backend": jax.default_backend()}
grid = (2048, 2048)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A_dia = dia_from_stencil(S1, grid, dtype=jnp.float32)
dsa = device_sa_setup(A_dia, grid=grid, dtype=jnp.float32, max_coarse=400)
float(dsa.hierarchy.coarse_inv[0, 0])
h = dsa.hierarchy
out["rtt_ms"] = round(_measure_rtt(jax, jnp) * 1e3, 2)

one_cycle = _make_cycle(len(h.levels), "V")
b0 = jnp.ones(h.levels[0].n_pad, dtype=jnp.float32)
t_cyc = _chained_time(jax, jnp,
                      lambda o, v: one_cycle(o, jnp.zeros_like(v), v),
                      h, b0, k=64)
out["vcycle_ms"] = round(t_cyc * 1e3, 3)

K = 8
bK = jnp.ones((K, h.levels[0].n_pad), dtype=jnp.float32)
oc_b = jax.vmap(lambda o, v: one_cycle(o, jnp.zeros_like(v), v),
                in_axes=(None, 0))
t_cyc_K = _chained_time(jax, jnp, oc_b, h, bK, k=32)
out["vcycle_K8_ms"] = round(t_cyc_K * 1e3, 3)
out["vcycle_K8_per_rhs_ms"] = round(t_cyc_K / K * 1e3, 3)
out["vcycle_K8_amort"] = round(t_cyc * K / t_cyc_K, 2)

l0 = h.levels[0]
xK = jnp.ones((K, l0.n_pad), dtype=jnp.float32)
stages = {
    "spmv": lambda o, v: o.levels[0].A @ v,
    "pre": lambda o, v: o.levels[0].pre(o.levels[0].A, v, v),
    "R": lambda o, v: jnp.pad(o.levels[0].R @ v,
                              (0, v.shape[0]
                               - (o.levels[0].R @ v).shape[0])),
}
for nm, st in stages.items():
    t1 = _chained_time(jax, jnp, st, h, b0, k=64)
    tk = _chained_time(jax, jnp,
                       jax.vmap(st, in_axes=(None, 0)), h, xK, k=32)
    out[f"stage_{nm}_1_ms"] = round(t1 * 1e3, 4)
    out[f"stage_{nm}_K8_ms"] = round(tk * 1e3, 4)
    out[f"stage_{nm}_amort"] = round(t1 * K / tk, 2)

with open("/tmp/probe_batched_r4.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
