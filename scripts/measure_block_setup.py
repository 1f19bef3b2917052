"""Measure the block device SA setup on TPU: elasticity 128^2 (config-4
problem scale) — setup wall time, V-cycle time, CG solve."""
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

from pyamg_tpu.engine import device_sa_setup_block
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.gallery import linear_elasticity
from bench import _chained_time

A, B = linear_elasticity((128, 128))
grid = (128, 127)

t0 = time.perf_counter()
ds = device_sa_setup_block(A, grid=grid, B=B, max_coarse=400)
float(ds.hierarchy.coarse_inv[0, 0])
t_cold = time.perf_counter() - t0

t0 = time.perf_counter()
ds = device_sa_setup_block(A, grid=grid, B=B, max_coarse=400)
float(ds.hierarchy.coarse_inv[0, 0])
t_warm = time.perf_counter() - t0

# elasticity's conditioning needs the f64 outer Krylov (f32-only CG
# stalls near relres ~1e-1 at this size); mixed runs the f32 hierarchy
# as preconditioner with the f64 matvec on device
dsm = device_sa_setup_block(A, grid=grid, B=B, max_coarse=400,
                            mixed_precision=True)
b = np.random.default_rng(3).random(A.shape[0])
res = []
dsm.solve(b, tol=1e-8, maxiter=100, accel="cg", residuals=res,
          precision="mixed")          # compile (untimed)
res = []
t0 = time.perf_counter()
x = dsm.solve(b, tol=1e-8, maxiter=100, accel="cg", residuals=res,
              precision="mixed")
t_solve = time.perf_counter() - t0
true_rel = float(np.linalg.norm(b - A @ x) / np.linalg.norm(b))

one_cycle = _make_cycle(len(ds.hierarchy.levels), "V")
h = ds.hierarchy
n_pad = h.levels[0].n_pad
bv = jnp.asarray(np.random.default_rng(0).random(n_pad), dtype=jnp.float32)
t_v = _chained_time(jax, jnp,
                    lambda o, v: one_cycle(o, jnp.zeros_like(v), v), h, bv,
                    k=32)

print(json.dumps({
    "problem": "elasticity 128^2 BSR bs=2, m=3, block device setup",
    "n": int(A.shape[0]),
    "t_setup_cold_s": round(t_cold, 2),
    "t_setup_warm_s": round(t_warm, 3),
    "t_solve_s": round(t_solve, 3),
    "cg_iters": len(res) - 1,
    "true_relres_mixed": true_rel,
    "t_vcycle_ms": round(t_v * 1e3, 3),
    "levels": [(l.n, getattr(l.A, "bs", None)) for l in h.levels],
}))
