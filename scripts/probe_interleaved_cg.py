"""TPU: interleaved batched CG vs vmapped batched solve, 2048^2 K=8.

Measured (round 5): interleaved 0.165 s to 1e-5 (dependent-sync wall;
~21 ms/RHS) vs vmapped solve 0.25 s.  SYNC LESSON recorded in
CLAUDE.md: pulling ONE output of a multi-output program can return
~0.7 s before sibling outputs finish on this relay — wall timings must
sync through a scalar depending on EVERY output (see
scripts' probe_cg_iso6 methodology: sum(X) + sum(hist))."""
import json, sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pyamg_tpu.sparse import dia_from_stencil
from pyamg_tpu.engine import device_sa_setup, interleaved_batched_cg

out = {}
grid = (2048, 2048)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A = dia_from_stencil(S1, grid, dtype=jnp.float32)
dsa = device_sa_setup(A, grid=grid, dtype=jnp.float32, max_coarse=400,
                      lane_align=True)
h = dsa.hierarchy
gp = h.levels[0].P.fine_grid_p
K = 8
rng = np.random.default_rng(0)
B = rng.standard_normal((K, grid[0], grid[1]))
Bg = np.zeros((K,) + tuple(gp), dtype=np.float32)
Bg[:, :grid[0], :grid[1]] = B
n_pad = h.levels[0].n_pad
Bk = jnp.asarray(Bg.reshape(K, -1))
if Bk.shape[1] < n_pad:
    Bk = jnp.pad(Bk, ((0, 0), (0, n_pad - Bk.shape[1])))
float(jnp.sum(jnp.abs(Bk)))

cg = jax.jit(lambda hh, b: interleaved_batched_cg(hh, b, tol=1e-5,
                                                  maxiter=40))
X, hist = cg(h, Bk)            # compile
jax.block_until_ready(X); float(hist[0, 0])
t0 = time.time()
X, hist = cg(h, Bk)
float(jnp.sum(jnp.nan_to_num(hist)))   # sync via pull
out["int_cg_s"] = round(time.time() - t0, 3)
hh = np.asarray(hist)
out["int_cg_iters"] = int(np.max(np.sum(~np.isnan(hh), axis=0))) - 1

# vmapped batched solve (the round-2 (n, K) path); b staged on device
b2 = jnp.asarray(np.asarray(B.reshape(K, -1)).T.copy(),
                 dtype=jnp.float32)
float(jnp.sum(jnp.abs(b2)))
res = []
dsa.solve(b2, tol=1e-5, maxiter=40, accel="cg", residuals=res,
          device_out=True)
t0 = time.time()
res = []
x2 = dsa.solve(b2, tol=1e-5, maxiter=40, accel="cg", residuals=res,
               device_out=True)
jax.block_until_ready(x2)
out["vmapped_solve_s"] = round(time.time() - t0, 3)
res = np.asarray(res)
out["vmapped_iters"] = int(res.shape[0]) - 1 if res.ndim else None
json.dump(out, open("/tmp/int_cg.json", "w"), indent=1)
print(json.dumps(out))
