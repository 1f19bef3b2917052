"""Host-built (compile_hierarchy) 2048^2 SA V-cycle breakdown — round 4
noticed t_vcycle_ms 5.5 vs round-3's 4.6; find which stage moved.
Writes /tmp/probe_hostbuilt.json."""
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
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.engine import compile_hierarchy
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.gallery import poisson

out = {"backend": jax.default_backend()}
A = poisson((2048, 2048), format="csr")
ml = smoothed_aggregation_solver(A)
h = compile_hierarchy(ml)
float(h.coarse_inv[0, 0])
rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 3)
out["levels"] = [f"{type(l.A).__name__}:{l.n_pad}" for l in h.levels]
out["smoothers"] = [l.pre.config[0] for l in h.levels]


def net(fn, v, k=64):
    t = _chained_time(jax, jnp, fn, h, v, k=k)
    return round((t - rtt / k) * 1e3, 4)


kms = {}
oc = _make_cycle(len(h.levels), "V")
b0 = jnp.ones(h.levels[0].n_pad, dtype=jnp.float32)
kms["vcycle"] = net(lambda o, v: oc(o, jnp.zeros_like(v), v), b0, k=32)
kms["vcycle_zero"] = net(lambda o, v: oc.zero(o, v), b0, k=32)

for i in (0, 1):
    n_pad = h.levels[i].n_pad
    v = jnp.ones(n_pad, dtype=jnp.float32)
    nc_pad = h.levels[i + 1].n_pad

    def pre_s(o, v, i=i):
        l = o.levels[i]
        return l.pre(l.A, v, v)

    def pre_zero(o, v, i=i):
        l = o.levels[i]
        return l.pre.zero_call(l.A, v)

    def spmv(o, v, i=i):
        l = o.levels[i]
        return l.A @ v

    def restrict(o, v, i=i):
        l = o.levels[i]
        y = l.R @ v
        return jnp.pad(y, (0, v.shape[0] - y.shape[0]))

    def prolong(o, v, i=i, nc_pad=nc_pad):
        l = o.levels[i]
        y = l.P @ v[:nc_pad]
        if y.shape[0] < v.shape[0]:
            y = jnp.pad(y, (0, v.shape[0] - y.shape[0]))
        return y[: v.shape[0]]

    for nm, st in [("pre", pre_s), ("pre_zero", pre_zero),
                   ("spmv", spmv), ("restrict", restrict),
                   ("prolong", prolong)]:
        try:
            kms[f"L{i}_{nm}"] = net(st, v)
        except Exception as e:
            kms[f"L{i}_{nm}"] = f"err: {str(e)[:120]}"
        print(f"L{i}_{nm}", kms[f"L{i}_{nm}"], flush=True)

out["ms"] = kms
print(json.dumps(out), flush=True)
json.dump(out, open("/tmp/probe_hostbuilt.json", "w"), indent=1)
