"""Cold-compile wall time of device AIR at 1024^2 with 7 levels after
the per-level program split (VERDICT item 6: round 3's one-program
form did not finish compiling in 40 min; target < 5 min).  Also checks
the solve still converges.  Writes /tmp/probe_air_compile.json."""
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

from pyamg_tpu.engine import device_air_setup
from pyamg_tpu.gallery import advection_2d

out = {"backend": jax.default_backend()}
g = (1024, 1024)
A, _rhs = advection_2d(g, theta=np.pi / 4.0)
n = A.shape[0]
out["n"] = int(n)

t0 = time.time()
ds = device_air_setup(A, grid=(1024, 1024), max_levels=8, max_coarse=400)
float(ds.hierarchy.coarse_inv[0, 0])
out["t_air_setup_cold_s"] = round(time.time() - t0, 1)
out["levels"] = [int(l.n) for l in ds.hierarchy.levels]

t0 = time.time()
ds2 = device_air_setup(A, grid=(1024, 1024), max_levels=8,
                       max_coarse=400)
float(ds2.hierarchy.coarse_inv[0, 0])
out["t_air_setup_warm_s"] = round(time.time() - t0, 1)

b = jnp.asarray(np.random.default_rng(0).random(A.shape[0]),
                dtype=jnp.float32)
res = []
t0 = time.time()
ds.solve(b, tol=1e-8, maxiter=60, accel="fgmres", cycle="W",
         residuals=res)
out["t_solve_s"] = round(time.time() - t0, 1)
res = [float(r) for r in np.asarray(res) if not np.isnan(r)]
out["iters"] = len(res) - 1
out["rel_res"] = res[-1] / res[0]
out["first_cycle_drop"] = res[0] / res[1] if len(res) > 1 else None

with open("/tmp/probe_air_compile.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
