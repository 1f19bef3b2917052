"""Per-component V-cycle breakdown at 2048^2 (config-1 headline).

Times each constituent op of the finest level and each level's full
subtree with chained timing, to locate where the 5.5 ms goes.
"""
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

import pyamg_tpu
from pyamg_tpu.engine import DeviceMultilevelSolver, compile_hierarchy
from pyamg_tpu.engine.solver import _make_cycle, _fitv
from pyamg_tpu.gallery import poisson
from bench import _chained_time

grid = (2048, 2048)
A = poisson(grid, format="csr")
ml = pyamg_tpu.smoothed_aggregation_solver(
    A, presmoother=("jacobi", {"omega": 4.0 / 3.0}),
    postsmoother=("jacobi", {"omega": 4.0 / 3.0}))
dml = DeviceMultilevelSolver(compile_hierarchy(ml, dtype=jnp.float32))
h = dml.hierarchy
nlev = len(h.levels)
out = {"levels": [(l.n, type(l.A).__name__) for l in h.levels]}

b = jnp.asarray(np.random.default_rng(0).random(h.levels[0].n_pad),
                dtype=jnp.float32)

# finest-level ops
L0 = h.levels[0]
out["spmv_ms"] = 1e3 * _chained_time(jax, jnp, lambda o, v: o @ v, L0.A, b,
                                     k=128)
out["presmooth_ms"] = 1e3 * _chained_time(
    jax, jnp, lambda o, v: o.pre(o.A, v, b), L0, b, k=128)
nc_pad = h.levels[1].n_pad


def _rp_round(o, v):
    rc = _fitv(o.R @ v, nc_pad)
    return _fitv(o.P @ rc, v.shape[0])


out["R_then_P_ms"] = 1e3 * _chained_time(jax, jnp, _rp_round, L0, b, k=64)

# level-subtree costs: run a V-cycle on the hierarchy truncated to
# levels i.. (treat level i as finest)
from pyamg_tpu.engine.hierarchy import DeviceHierarchy


def subtree(i):
    hh = DeviceHierarchy(levels=h.levels[i:], coarse_inv=h.coarse_inv,
                         nc=h.nc, nc_pad=h.nc_pad, dtype=h.dtype)
    cyc = _make_cycle(nlev - i, "V")
    bb = jnp.asarray(np.random.default_rng(1).random(
        h.levels[i].n_pad), dtype=jnp.float32)
    return 1e3 * _chained_time(
        jax, jnp, lambda o, v: cyc(o, jnp.zeros_like(v), v), hh, bb, k=64)


for i in range(nlev - 1):
    out[f"subtree_from_L{i}_ms"] = round(subtree(i), 3)

for k in list(out):
    if isinstance(out[k], float):
        out[k] = round(out[k], 3)
print(json.dumps(out))
