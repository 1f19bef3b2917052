"""Probe: windowed transfer kernel cost vs row-block size (round 3).

The config-1 finest R;P pair costs 3.26 ms of the 5.5 ms V-cycle; T has
k=1 nnz/row, so the Pallas grid-step overhead (nb steps) should dominate
over the one-hot MXU work.  Measure T@xc / T^T@r with block in {2048,
4096, 8192} plus the DIA S factor applies, to pick the cheapest layout.
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

import scipy.sparse as sp
import pyamg_tpu
from pyamg_tpu.gallery import poisson
from pyamg_tpu.sparse import windowed_from_scipy, TransposedWindowed
from pyamg_tpu.sparse.dia import dia_from_scipy
from bench import _chained_time

grid = (2048, 2048)
A = poisson(grid, format="csr")
ml = pyamg_tpu.smoothed_aggregation_solver(
    A, presmoother=("jacobi", {"omega": 4.0 / 3.0}),
    postsmoother=("jacobi", {"omega": 4.0 / 3.0}))
fac = ml.levels[0].P._sa_factor
T = sp.csr_matrix(fac["T"])
out = {"T_shape": list(T.shape), "T_nnz": int(T.nnz),
       "k_per_row": float(T.nnz / T.shape[0])}

nc = T.shape[1]
xc = jnp.asarray(np.random.default_rng(0).random(
    max(nc, 1)), dtype=jnp.float32)
r = jnp.asarray(np.random.default_rng(1).random(T.shape[0]),
                dtype=jnp.float32)

for blk in (2048, 4096, 8192):
    try:
        W = windowed_from_scipy(T, dtype=jnp.float32, block=blk)
        if W is None:
            out[f"blk{blk}"] = "not windowable"
            continue
        info = {"w2": W.w2, "n_blocks": int(W.data.shape[0]),
                "k": int(W.k)}
        m_pad = W.m_chunks * W.w2
        xcp = jnp.pad(xc, (0, m_pad - xc.shape[0]))
        # shape-stable chain: coarse carry -> fwd apply -> truncate back
        info["t_fwd_ms"] = round(1e3 * _chained_time(
            jax, jnp, lambda o, v: (o @ v)[: v.shape[0]],
            W, xcp, k=64), 3)
        if W._can_transpose_pallas():
            rp = jnp.pad(r, (0, W.n_pad - r.shape[0]))
            # fine carry -> transpose apply -> pad back to fine length
            info["t_tr_ms"] = round(1e3 * _chained_time(
                jax, jnp,
                lambda o, v: jnp.pad(o.rmatvec(v),
                                     (0, v.shape[0] - o.m_chunks * o.w2)),
                W, rp, k=64), 3)
        else:
            info["t_tr_ms"] = None
        out[f"blk{blk}"] = info
    except Exception as e:
        out[f"blk{blk}"] = f"{type(e).__name__}: {e}"[:200]

# DIA S factor apply (the other half of the composed P = S @ T)
from pyamg_tpu.engine.hierarchy import (_smoothing_factor_dia,
                                        _smoothing_factor_host)
from pyamg_tpu.sparse import select_operator
A_dev = select_operator(sp.csr_matrix(ml.levels[0].A), dtype=jnp.float32,
                        row_pad=1024)
S_dev = _smoothing_factor_dia(A_dev, ml.levels[0].A, fac, jnp.float32)
v = jnp.asarray(np.random.default_rng(2).random(S_dev.n_pad),
                dtype=jnp.float32)
out["t_S_dia_ms"] = round(1e3 * _chained_time(
    jax, jnp, lambda o, u: o @ u, S_dev, v, k=128), 3)

print(json.dumps(out))
