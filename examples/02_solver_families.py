"""One problem, every setup family."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import pyamg_tpu
from pyamg_tpu.gallery import advection_2d, linear_elasticity, poisson

b_of = lambda A: np.random.default_rng(0).random(A.shape[0])

A = poisson((128, 128), format="csr")
for name, build in [
    ("ruge_stuben", lambda: pyamg_tpu.ruge_stuben_solver(A)),
    ("smoothed_aggregation", lambda: pyamg_tpu.smoothed_aggregation_solver(A)),
    ("rootnode", lambda: pyamg_tpu.rootnode_solver(A, strength="symmetric")),
    ("pairwise", lambda: pyamg_tpu.pairwise_solver(A)),
]:
    ml = build()
    res = []
    ml.solve(b_of(A), tol=1e-8, accel="cg", residuals=res)
    print(f"{name:22s}: {len(res) - 1:3d} CG iterations, "
          f"opcomplexity {ml.operator_complexity():.2f}")

ml, work = pyamg_tpu.adaptive_sa_solver(A, num_candidates=2)
res = []
ml.solve(b_of(A), tol=1e-8, accel="cg", residuals=res)
print(f"{'adaptive_sa':22s}: {len(res) - 1:3d} CG iterations (setup work {work:.0f})")

# nonsymmetric: AIR on upwind advection
Aadv, rhs = advection_2d((64, 64))
ml = pyamg_tpu.air_solver(Aadv)
res = []
ml.solve(rhs, tol=1e-10, maxiter=40, residuals=res)
print(f"{'air (advection)':22s}: {len(res) - 1:3d} iterations")

# block system: elasticity with rigid-body modes
Ae, B = linear_elasticity((32, 32))
ml = pyamg_tpu.smoothed_aggregation_solver(Ae, B=B)
res = []
ml.solve(b_of(Ae), tol=1e-8, accel="cg", residuals=res)
print(f"{'sa (elasticity+RBM)':22s}: {len(res) - 1:3d} CG iterations")

import os
import sys

