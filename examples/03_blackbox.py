"""Zero-configuration solve ([R] pyamg/blackbox.py, SURVEY.md §3.5)."""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import pyamg_tpu
from pyamg_tpu.gallery import recirc_flow

A = recirc_flow((64, 64), epsilon=1e-2)   # nonsymmetric
b = np.random.default_rng(0).random(A.shape[0])
x, ml = pyamg_tpu.solve(A, b, tol=1e-8, return_solver=True)

# reuse the built solver for another right-hand side
b2 = np.random.default_rng(1).random(A.shape[0])
x2 = pyamg_tpu.solve(A, b2, existing_solver=ml, verb=False)
print("second solve residual:",
      np.linalg.norm(b2 - A @ x2) / np.linalg.norm(b2))

import os
import sys

