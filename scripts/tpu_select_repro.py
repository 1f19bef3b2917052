"""Minimal TPU check of the windowed select kernel (and the stage-A MIS
program) before re-running the full unstructured measurement.  Exits
cleanly."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pyamg_tpu.sparse import windowed_from_scipy
from pyamg_tpu.gallery import gradgradform, regular_triangle_mesh

print("backend:", jax.default_backend(), flush=True)
V, E = regular_triangle_mesh(120, 120)
n = 14400
A = (sp.csr_matrix(gradgradform(V, E)) + 1e-2 * sp.eye(n, format="csr")).tocsr()
A.sort_indices()
W = windowed_from_scipy(A, block=1024)
print("windowed:", W.block, W.w2, W.data.shape, flush=True)

rng = np.random.default_rng(0)
x = jnp.asarray(rng.integers(0, 2 ** 23, W.m_chunks * W.w2),
                dtype=jnp.float32)
t0 = time.time()
got = np.asarray(W.select(x))
print("select compiled+ran in", round(time.time() - t0, 1), "s", flush=True)
gidx = (np.asarray(W.starts)[:, None, None] * W.w2 + np.asarray(W.idx))
want = np.asarray(x)[gidx]
err = np.abs(got - want).max()
print("select max err:", err, flush=True)
assert err == 0

from pyamg_tpu.engine.unstructured_setup import _stage_roots
t0 = time.time()
roots = np.asarray(_stage_roots(W, theta=0.0, seed=0))
print("stage_roots:", int(roots.sum()), "roots of", n, "in",
      round(time.time() - t0, 1), "s", flush=True)
print("OK")
