"""Direct device-engine control: formats, mixed precision, sharding."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

import pyamg_tpu
from pyamg_tpu.engine import (DeviceMultilevelSolver, compile_hierarchy)
from pyamg_tpu.engine.solver import profile_cycle
from pyamg_tpu.gallery import poisson

A = pyamg_tpu.gallery.poisson((1024, 1024), format="csr")
ml = pyamg_tpu.smoothed_aggregation_solver(
    A, presmoother=("jacobi", {"omega": 4 / 3}),
    postsmoother=("jacobi", {"omega": 4 / 3}))

# inspect the chosen device formats per level
hier = compile_hierarchy(ml, dtype=jnp.float32, mixed_precision=True)
for i, lvl in enumerate(hier.levels):
    print(f"level {i}: n={lvl.n:8d}  A={type(lvl.A).__name__}")

dml = DeviceMultilevelSolver(hier)
print(profile_cycle(dml))   # wall time + nnz/s roofline counter

# full-device mixed-precision solve to 1e-8
b = np.random.default_rng(0).random(A.shape[0])
res = []
x = dml.solve(b, tol=1e-8, accel="cg", residuals=res, precision="mixed")
print(f"mixed solve: {len(res) - 1} iters, relres {res[-1] / res[0]:.2e}")

import os
import sys

