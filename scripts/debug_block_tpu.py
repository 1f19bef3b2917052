"""Diagnose the block setup on TPU: compare setup products and matvec
accuracy against host-computed references (32^2 elasticity)."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyamg_tpu.engine import device_sa_setup_block
from pyamg_tpu.gallery import linear_elasticity
from pyamg_tpu.sparse import block_dia_from_scipy

A, B = linear_elasticity((32, 32))
out = {}

# 1) f64 block matvec accuracy on TPU vs scipy
Ab = block_dia_from_scipy(A.tobsr(), dtype=jnp.float64)
x = np.random.default_rng(0).standard_normal(A.shape[0])
y_ref = A @ x
xd = jnp.asarray(x, dtype=jnp.float64)
y_dev = np.asarray(Ab @ xd)[: A.shape[0]]
out["matvec_f64_relerr"] = float(
    np.linalg.norm(y_dev - y_ref) / np.linalg.norm(y_ref))

# 2) f32 matvec accuracy
Ab32 = block_dia_from_scipy(A.tobsr(), dtype=jnp.float32)
y32 = np.asarray(Ab32 @ jnp.asarray(x, dtype=jnp.float32))[: A.shape[0]]
out["matvec_f32_relerr"] = float(
    np.linalg.norm(y32 - y_ref) / np.linalg.norm(y_ref))

# 3) f32 device setup, then solve f32-only and mixed, short runs
ds = device_sa_setup_block(A, grid=(32, 31), B=B, mixed_precision=True)
b = np.random.default_rng(1).random(A.shape[0])
res = []
xs = ds.solve(b, tol=1e-6, maxiter=30, accel="cg", residuals=res)
out["f32_iters"] = len(res) - 1
out["f32_true"] = float(np.linalg.norm(b - A @ xs) / np.linalg.norm(b))
res = []
xm = ds.solve(b, tol=1e-9, maxiter=30, accel="cg", residuals=res,
              precision="mixed")
out["mixed_iters"] = len(res) - 1
out["mixed_hist_first5"] = [float(r / res[0]) for r in res[:5]]
out["mixed_true"] = float(np.linalg.norm(b - A @ xm) / np.linalg.norm(b))

# 4) one V-cycle output vs CPU-computed (golden stored offline?) — just
# report the cycle's residual-reduction on device
from pyamg_tpu.engine.solver import _make_cycle
h = ds.hierarchy
cyc = _make_cycle(len(h.levels), "V")
bb = jnp.asarray(np.pad(b, (0, h.levels[0].n_pad - len(b))),
                 dtype=jnp.float32)
f = jax.jit(lambda hh, v: cyc(hh, jnp.zeros_like(v), v))
x1 = f(h, bb)
r1 = bb - (h.levels[0].A @ x1)
out["vcycle_relres"] = float(jnp.linalg.norm(r1) / jnp.linalg.norm(bb))

print(json.dumps(out))
