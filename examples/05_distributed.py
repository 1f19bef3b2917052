"""Row-partitioned multi-device solve (SURVEY.md §2.5 / §7 step 7).

Runs on any device count; on a CPU-only machine start with
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to emulate an 8-chip mesh (what tests/ and dryrun_multichip do).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import pyamg_tpu
from pyamg_tpu.engine import DeviceMultilevelSolver, compile_hierarchy
from pyamg_tpu.parallel import (
    initialize_distributed,
    make_halo_dia_spmv,
    make_solver_mesh,
    shard_hierarchy,
)
from pyamg_tpu.sparse import dia_from_scipy, pad_vector

pid, nproc, ndev = initialize_distributed()
print(f"process {pid}/{nproc}, {ndev} device(s)")
mesh = make_solver_mesh(ndev)

A = pyamg_tpu.gallery.poisson((64, 64), format="csr")
ml = pyamg_tpu.smoothed_aggregation_solver(
    A, presmoother=("jacobi", {"omega": 4 / 3}),
    postsmoother=("jacobi", {"omega": 4 / 3}))

# 1. whole solver, row-partitioned (GSPMD: collectives auto-inserted)
hier = shard_hierarchy(
    compile_hierarchy(ml, dtype=jnp.float32, row_pad=8 * ndev), mesh)
dml = DeviceMultilevelSolver(hier)
n_pad = hier.levels[0].n_pad
b = np.random.default_rng(0).random(A.shape[0])
b_dev = jax.device_put(pad_vector(jnp.asarray(b, jnp.float32), n_pad),
                       NamedSharding(mesh, P("x")))
run = dml._get_compiled("V", "cg", 30, 30)
x, hist, it = run(hier, b_dev, jnp.zeros_like(b_dev),
                  jnp.asarray(1e-6, jnp.float32))
x = np.asarray(x)[: A.shape[0]]
print(f"partitioned V+CG: {int(it)} iterations, "
      f"relres {np.linalg.norm(b - A @ x) / np.linalg.norm(b):.1e}")

# 2. explicit halo-exchange SpMV (shard_map + ppermute)
dia = dia_from_scipy(A, dtype=jnp.float64, row_pad=8 * ndev)
spmv, place = make_halo_dia_spmv(dia, mesh)
data = jax.device_put(dia.data, NamedSharding(mesh, P(None, "x")))
xv = np.random.default_rng(1).random(dia.n_pad)
xv[A.shape[0]:] = 0
y = np.asarray(spmv(data, place(xv)))[: A.shape[0]]
print("halo SpMV max err:",
      np.abs(y - A @ xv[: A.shape[0]]).max())
