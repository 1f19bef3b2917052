"""Round-3 V-cycle re-measurement: big windowed blocks + coarse cutoff.

Baseline (this session, pre-change): V-cycle 5.50 ms, finest R;P 3.26 ms,
subtree below L4 0.46 ms.  Target: ~4.4 ms.
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
out = {}
b_host = np.random.default_rng(0).random(A.shape[0])

for tag, kw in (("cut1024", {"coarse_cutoff": 1024}),
                ("full", {})):
    dml = DeviceMultilevelSolver(compile_hierarchy(ml, dtype=jnp.float32,
                                                   **kw))
    h = dml.hierarchy
    nlev = len(h.levels)
    one_cycle = _make_cycle(nlev, "V")
    b = jnp.asarray(np.random.default_rng(0).random(h.levels[0].n_pad),
                    dtype=jnp.float32)
    t_cycle = _chained_time(
        jax, jnp, lambda o, v: one_cycle(o, jnp.zeros_like(v), v), h, b,
        k=64)
    L0 = h.levels[0]
    nc_pad = h.levels[1].n_pad

    def _rp(o, v, nc=nc_pad):
        return _fitv(o.P @ _fitv(o.R @ v, nc), v.shape[0])

    t_rp = _chained_time(jax, jnp, _rp, L0, b, k=64)
    res = []
    dml.solve(b_host, tol=1e-5, maxiter=40, accel="cg", residuals=res)
    out[tag] = {
        "levels": nlev,
        "formats": [type(l.A).__name__ for l in h.levels],
        "t_vcycle_ms": round(t_cycle * 1e3, 3),
        "t_RP_ms": round(t_rp * 1e3, 3),
        "cg_iters_to_1e-5": len(res) - 1,
        "relres": float(res[-1] / res[0]),
    }
    del dml, h
    jax.clear_caches()

print(json.dumps(out))
