"""Round-3 check: batched multi-RHS V-cycle with 8192-row windowed blocks.

The round-3 bench caught a Mosaic VMEM OOM in the fused K-lane kernels at
block=8192 (stage-1 intermediate (K*H, BLOCK) = 8 MB); the fix chunks the
lanes.  Verify the vmapped cycle compiles, matches per-lane solves, and
report the amortization.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pyamg_tpu
from pyamg_tpu.engine import DeviceMultilevelSolver, compile_hierarchy
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.gallery import poisson
from bench import _chained_time

grid = (2048, 2048)
A = poisson(grid, format="csr")
ml = pyamg_tpu.smoothed_aggregation_solver(
    A, presmoother=("jacobi", {"omega": 4.0 / 3.0}),
    postsmoother=("jacobi", {"omega": 4.0 / 3.0}))
dml = DeviceMultilevelSolver(compile_hierarchy(ml, dtype=jnp.float32,
                                               coarse_cutoff=1024))
h = dml.hierarchy
n_pad = h.levels[0].n_pad
one_cycle = _make_cycle(len(h.levels), "V")
K = 8
b = jnp.asarray(np.random.default_rng(0).random(n_pad), dtype=jnp.float32)
bK = jnp.asarray(np.random.default_rng(7).random((K, n_pad)),
                 dtype=jnp.float32)
out = {}

t1 = _chained_time(jax, jnp,
                   lambda o, v: one_cycle(o, jnp.zeros_like(v), v), h, b,
                   k=64)
out["t_vcycle_ms"] = round(t1 * 1e3, 3)

one_cycle_b = jax.vmap(lambda o, v: one_cycle(o, jnp.zeros_like(v), v),
                       in_axes=(None, 0))
tK = _chained_time(jax, jnp, one_cycle_b, h, bK, k=32)
out["t_vcycle_K%d_per_rhs_ms" % K] = round(tK / K * 1e3, 3)
out["amortization"] = round(t1 * K / tK, 2)

# numerics: lane 0 of the batched cycle == single cycle on that lane
yb = one_cycle_b(h, bK)
y0 = one_cycle(h, jnp.zeros_like(bK[0]), bK[0])
err = float(jnp.max(jnp.abs(yb[0] - y0)) / jnp.max(jnp.abs(y0)))
out["lane0_rel_err"] = err
assert err < 1e-5, err
print(json.dumps(out))
