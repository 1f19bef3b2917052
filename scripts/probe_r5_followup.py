"""Round-5 follow-up TPU probes: (1) probe K=64 A/B on the standard
640k unstructured setup; (2) aggressive + Chebyshev smoothing (12->8
iters on CPU at 60^2) — setup/V-cycle/iters at 640k.

Writes /tmp/probe_r5_followup.json; run detached, exits cleanly."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyamg_tpu.gallery import gradgradform, regular_triangle_mesh
from pyamg_tpu.engine import unstructured_setup as us
from pyamg_tpu.engine.unstructured_setup import device_unstructured_sa_setup

out = {"backend": jax.default_backend()}
NX = 800
V, E = regular_triangle_mesh(NX, NX)
A = sp.csr_matrix(gradgradform(V, E))
n = A.shape[0]
A = (A + 1e-2 * sp.eye(n, format="csr")).tocsr()
b = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                dtype=jnp.float32)

# ---- part 1: K=64 standard A/B ----------------------------------------
us._PROBE_K = 64
t0 = time.time()
d = device_unstructured_sa_setup(A, max_coarse=1000)
float(d.hierarchy.coarse_inv[0, 0])
out["std_k64_cold_s"] = round(time.time() - t0, 2)
t0 = time.time()
d = device_unstructured_sa_setup(A, max_coarse=1000)
float(d.hierarchy.coarse_inv[0, 0])
out["std_k64_warm_s"] = round(time.time() - t0, 2)
us._PROBE_K = 32

# ---- part 2: aggressive + chebyshev -----------------------------------
spec = ("chebyshev", {})
t0 = time.time()
da = device_unstructured_sa_setup(A, max_coarse=1000,
                                  aggregate="aggressive",
                                  presmoother=spec, postsmoother=spec)
float(da.hierarchy.coarse_inv[0, 0])
out["agg_cheb_cold_s"] = round(time.time() - t0, 2)
t0 = time.time()
da = device_unstructured_sa_setup(A, max_coarse=1000,
                                  aggregate="aggressive",
                                  presmoother=spec, postsmoother=spec)
float(da.hierarchy.coarse_inv[0, 0])
out["agg_cheb_warm_s"] = round(time.time() - t0, 2)

res = []
t0 = time.time()
x = da.solve(b, tol=1e-6, maxiter=100, accel="cg", residuals=res,
             device_out=True)
jax.block_until_ready(x)
out["agg_cheb_solve_s"] = round(time.time() - t0, 2)
res = [float(r) for r in np.asarray(res) if not np.isnan(r)]
out["agg_cheb_iters"] = len(res) - 1
out["agg_cheb_relres"] = res[-1] / res[0]

from bench import _chained_time, _measure_rtt
from pyamg_tpu.engine.solver import _make_cycle
h = da.hierarchy
oc = _make_cycle(len(h.levels), "V")
b0 = jnp.ones(h.levels[0].n_pad, dtype=jnp.float32)
t_cyc = _chained_time(jax, jnp, lambda o, v: oc(o, jnp.zeros_like(v), v),
                      h, b0, k=32)
rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 2)
out["agg_cheb_vcycle_ms"] = round(t_cyc * 1e3, 3)
out["agg_cheb_vcycle_net_ms"] = round((t_cyc - rtt / 32) * 1e3, 3)

with open("/tmp/probe_r5_followup.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
