"""TPU probe: interleaved batched V-cycle vs vmapped K-major cycle
(round 5 — engine/batched_cycle.py).  Parity + chained per-RHS timing
at 2048^2 lane_align, K=8.  Writes /tmp/probe_int_cycle.json."""
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
from pyamg_tpu.gallery import poisson
from pyamg_tpu.engine import device_sa_setup
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.engine.batched_cycle import (interleaved_zero_vcycle,
                                            supports_interleaved)
from pyamg_tpu.sparse.interleaved import to_interleaved, from_interleaved
from pyamg_tpu.sparse import dia_from_stencil

out = {"backend": jax.default_backend()}
grid = (2048, 2048)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A = dia_from_stencil(S1, grid, dtype=jnp.float32)
dsa = device_sa_setup(A, grid=grid, dtype=jnp.float32, max_coarse=400,
                      lane_align=True)
h = dsa.hierarchy
out["supports"] = supports_interleaved(h)
out["n_pad"] = int(h.levels[0].n_pad)
K = 8
rng = np.random.default_rng(7)
Bk = jnp.asarray(rng.standard_normal((K, h.levels[0].n_pad)),
                 dtype=jnp.float32)

oc = _make_cycle(len(h.levels), "V")
vm = jax.jit(jax.vmap(oc.zero, in_axes=(None, 0)))
ref = vm(h, Bk)
float(jnp.sum(jnp.abs(ref)))

Bi = to_interleaved(Bk)
ic = jax.jit(interleaved_zero_vcycle)
got = from_interleaved(ic(h, Bi))
err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
out["parity_rel_err"] = err
print("parity", err, flush=True)

rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 3)

t_vm = _chained_time(jax, jnp, lambda o, v: jax.vmap(
    oc.zero, in_axes=(None, 0))(o, v), h, Bk, k=32)
out["vmapped_ms_raw"] = round(t_vm * 1e3, 3)
out["vmapped_per_rhs_net_ms"] = round((t_vm - rtt / 32) / K * 1e3, 4)

t_ic = _chained_time(jax, jnp, interleaved_zero_vcycle, h, Bi, k=32)
out["interleaved_ms_raw"] = round(t_ic * 1e3, 3)
out["interleaved_per_rhs_net_ms"] = round((t_ic - rtt / 32) / K * 1e3,
                                          4)

# single-RHS net reference for the amortization number
t1 = _chained_time(jax, jnp, lambda o, v: oc.zero(o, v), h, Bk[0], k=64)
out["single_net_ms"] = round((t1 - rtt / 64) * 1e3, 4)
out["amort_vmapped"] = round((t1 - rtt / 64) * K / (t_vm - rtt / 32), 3)
out["amort_interleaved"] = round(
    (t1 - rtt / 64) * K / (t_ic - rtt / 32), 3)

with open("/tmp/probe_int_cycle.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out), flush=True)
