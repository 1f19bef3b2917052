"""TPU measurement: unstructured device SA setup vs host setup at scale.

VERDICT r4 item-1 done-criterion: device setup on a genuinely
unstructured matrix (P1 FEM stiffness, >=500k dofs) with convergence
parity vs host setup and warm setup wall-time beating the host path
through the relay.  Writes /tmp/unstr_tpu.json; run detached, exits
cleanly (never kill a TPU-attached process)."""
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

out = {"backend": jax.default_backend()}
NX = int(sys.argv[1]) if len(sys.argv) > 1 else 800
MODE = sys.argv[2] if len(sys.argv) > 2 else "standard"
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else None
out["aggregate"] = MODE
out["smooth_passes"] = PASSES

t0 = time.time()
V, E = regular_triangle_mesh(NX, NX)
A = sp.csr_matrix(gradgradform(V, E))
n = A.shape[0]
A = (A + 1e-2 * sp.eye(n, format="csr")).tocsr()
out["n"] = n
out["nnz"] = int(A.nnz)
out["t_matrix_s"] = round(time.time() - t0, 2)

rng = np.random.default_rng(0)
b_host = rng.standard_normal(n)
b = jnp.asarray(b_host, dtype=jnp.float32)

from pyamg_tpu.engine.unstructured_setup import device_unstructured_sa_setup

# ---- device setup: cold (incl. compile through the relay) ------------
t0 = time.time()
dsa = device_unstructured_sa_setup(A, max_coarse=1000,
                                   aggregate=MODE, smooth_passes=PASSES)
# force completion of all async device work
float(dsa.hierarchy.coarse_inv[0, 0])
out["t_device_setup_cold_s"] = round(time.time() - t0, 2)
out["device_levels"] = [int(l.n) for l in dsa.hierarchy.levels]
out["setup_info"] = dsa.setup_info

# warm: same geometry -> all jits cached
t0 = time.time()
dsa2 = device_unstructured_sa_setup(A, max_coarse=1000,
                                    aggregate=MODE, smooth_passes=PASSES)
float(dsa2.hierarchy.coarse_inv[0, 0])
out["t_device_setup_warm_s"] = round(time.time() - t0, 2)

# ---- device solve ------------------------------------------------------
res = []
t0 = time.time()
x = dsa.solve(b, tol=1e-6, maxiter=100, accel="cg", residuals=res,
              device_out=True)
jax.block_until_ready(x)
out["t_device_solve_s"] = round(time.time() - t0, 2)
res = [float(r) for r in np.asarray(res) if not np.isnan(r)]
out["device_iters"] = len(res) - 1
out["device_rel_res"] = res[-1] / res[0]
r_true = np.linalg.norm(b_host - A @ np.asarray(x[:n], dtype=np.float64))
out["device_true_rel_res"] = float(r_true / np.linalg.norm(b_host))

# chained V-cycle time
from bench import _chained_time, _measure_rtt
from pyamg_tpu.engine.solver import _make_cycle
h = dsa.hierarchy
oc = _make_cycle(len(h.levels), "V")
b0 = jnp.ones(h.levels[0].n_pad, dtype=jnp.float32)
k = 32
t_cyc = _chained_time(jax, jnp, lambda o, v: oc(o, jnp.zeros_like(v), v),
                      h, b0, k=k)
rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 2)
out["vcycle_ms"] = round(t_cyc * 1e3, 3)

if len(sys.argv) > 4 and sys.argv[4] == "nohost":
    with open("/tmp/unstr_tpu.json", "w") as f:
        json.dump(out, f, indent=1, default=float)
    print(json.dumps(out, default=float))
    sys.exit(0)

# ---- host setup (reference-semantics path) -----------------------------
from pyamg_tpu.aggregation import smoothed_aggregation_solver
from pyamg_tpu.engine import compile_hierarchy

t0 = time.time()
ml = smoothed_aggregation_solver(A, max_coarse=1000)
out["t_host_setup_s"] = round(time.time() - t0, 2)
out["host_levels"] = [int(l.A.shape[0]) for l in ml.levels]

res_h = []
t0 = time.time()
ml.solve(b_host, tol=1e-6, maxiter=100, accel="cg", residuals=res_h)
out["t_host_solve_s"] = round(time.time() - t0, 2)
out["host_iters"] = len(res_h) - 1

# host setup -> device compile (the round-3 fallback path for
# unstructured operators) for the wall-time comparison the verdict asks
from pyamg_tpu.engine import DeviceMultilevelSolver
t0 = time.time()
dml = DeviceMultilevelSolver(compile_hierarchy(ml))
float(dml.hierarchy.coarse_inv[0, 0])
out["t_compile_hierarchy_s"] = round(time.time() - t0, 2)
res_c = []
x2 = dml.solve(b, tol=1e-6, maxiter=100, accel="cg", residuals=res_c,
               device_out=True)
jax.block_until_ready(x2)
res_c = [float(r) for r in np.asarray(res_c) if not np.isnan(r)]
out["hostbuilt_device_iters"] = len(res_c) - 1
h2 = dml.hierarchy
oc2 = _make_cycle(len(h2.levels), "V")
b02 = jnp.ones(h2.levels[0].n_pad, dtype=jnp.float32)
t_cyc2 = _chained_time(jax, jnp,
                       lambda o, v: oc2(o, jnp.zeros_like(v), v),
                       h2, b02, k=k)
out["hostbuilt_vcycle_ms"] = round(t_cyc2 * 1e3, 3)

out["total_s"] = round(time.time() - out.get("_t_all", time.time()), 1)
with open("/tmp/unstr_tpu.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
