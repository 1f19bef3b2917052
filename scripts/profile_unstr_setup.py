"""Per-stage TPU profile of the unstructured standard-mode SA setup
(round 5, VERDICT item 2: warm 26 s -> target <= 10 s at 640k).

Runs setup twice (cold incl. compiles, then warm) with the driver's
profile hooks; writes /tmp/unstr_profile.json.  Run detached; exits
cleanly (never kill a TPU-attached process)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyamg_tpu.gallery import gradgradform, regular_triangle_mesh
from pyamg_tpu.engine.unstructured_setup import device_unstructured_sa_setup

NX = int(sys.argv[1]) if len(sys.argv) > 1 else 800
MODE = sys.argv[2] if len(sys.argv) > 2 else "standard"

out = {"backend": jax.default_backend(), "mode": MODE}
t0 = time.time()
V, E = regular_triangle_mesh(NX, NX)
A = sp.csr_matrix(gradgradform(V, E))
n = A.shape[0]
A = (A + 1e-2 * sp.eye(n, format="csr")).tocsr()
out["n"] = n
out["t_matrix_s"] = round(time.time() - t0, 2)

prof_cold = {}
t0 = time.time()
dsa = device_unstructured_sa_setup(A, max_coarse=1000, aggregate=MODE,
                                   profile=prof_cold)
float(dsa.hierarchy.coarse_inv[0, 0])
out["t_cold_s"] = round(time.time() - t0, 2)
out["profile_cold"] = prof_cold
out["setup_info"] = dsa.setup_info

prof_warm = {}
t0 = time.time()
dsa = device_unstructured_sa_setup(A, max_coarse=1000, aggregate=MODE,
                                   profile=prof_warm)
float(dsa.hierarchy.coarse_inv[0, 0])
out["t_warm_s"] = round(time.time() - t0, 2)
out["profile_warm"] = prof_warm

with open("/tmp/unstr_profile.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out, indent=1))
