"""Round-4 perf probes on the real TPU (VERDICT items 2/3/4 groundwork).

Measures, with chained timing (bench._chained_time semantics):
 1. dispatch RTT + per-op on-chip floor (k-long chains of trivial ops)
 2. HBM copy / triad bandwidth (the roofline anchor for item 2)
 3. fused DIA SpMV + fused Jacobi at 4.2M (fraction of measured peak)
 4. per-level V-cycle breakdown of the device-built 2048^2 SA hierarchy
 5. batched K=8 per-stage amortization (item 3 diagnosis)

Writes /tmp/probe_r4_perf.json.  Run detached; exits cleanly (never kill
a TPU-attached process — CLAUDE.md).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _chained_time, _measure_rtt
import pyamg_tpu
from pyamg_tpu.engine import device_sa_setup
from pyamg_tpu.engine.solver import _make_cycle, profile_levels
from pyamg_tpu.sparse import dia_from_stencil

out = {"backend": jax.default_backend()}
t_all = time.time()

rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 3)

# ---- 1. per-op on-chip floor: chain of k dependent trivial elementwise
# ops on a tiny vector vs a large vector --------------------------------
for name, n in [("tiny_8k", 8192), ("mid_64k", 65536), ("big_4m", 2048 * 2048)]:
    v = jnp.ones(n, dtype=jnp.float32)
    t = _chained_time(jax, jnp, lambda o, u: u * 1.0001 + o, jnp.float32(1e-9),
                      v, k=256)
    out[f"axpy_{name}_us"] = round(t * 1e6, 2)

# ---- 2. HBM bandwidth anchors -----------------------------------------
N = 2048 * 2048 * 8  # 33.5M f32 = 134 MB
big = jnp.ones(N, dtype=jnp.float32)
t_copy = _chained_time(jax, jnp, lambda o, u: u * o, jnp.float32(1.0000001),
                       big, k=64)
out["scale_gbs"] = round(2 * N * 4 / t_copy / 1e9, 1)   # read + write
b2 = jnp.full(N, 0.5, dtype=jnp.float32)
t_triad = _chained_time(jax, jnp, lambda o, u: u + o * 1e-9, b2, big, k=64)
out["triad_gbs"] = round(3 * N * 4 / t_triad / 1e9, 1)  # 2 reads + write

# ---- 3. fused DIA SpMV / Jacobi at 4.2M -------------------------------
grid = (2048, 2048)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A_dia = dia_from_stencil(S1, grid, dtype=jnp.float32)
# pad like the solve phase does (32768 multiple)
from pyamg_tpu.engine.device_setup import _solve_pad
from pyamg_tpu.sparse import DIAMatrix
n = A_dia.n_pad
n_pad = _solve_pad(n)
A_p = DIAMatrix(data=jnp.pad(A_dia.data, ((0, 0), (0, n_pad - n))),
                offsets=A_dia.offsets, shape=A_dia.shape, nnz=A_dia.nnz)
x = jnp.ones(n_pad, dtype=jnp.float32)
t_spmv = _chained_time(jax, jnp, lambda o, u: o @ u, A_p, x, k=256)
nnz = A_dia.nnz
out["spmv_ms"] = round(t_spmv * 1e3, 4)
out["spmv_gnnz_s"] = round(nnz / t_spmv / 1e9, 2)
# traffic: data (5 diags) + x read + y write, f32
traffic = (A_p.data.shape[0] * n_pad + 2 * n_pad) * 4
out["spmv_gbs"] = round(traffic / t_spmv / 1e9, 1)
out["spmv_frac_of_triad"] = round(
    (traffic / t_spmv / 1e9) / out["triad_gbs"], 3)

from pyamg_tpu.sparse.dia import dia_pallas_jacobi
dinv = jnp.where(A_p.diagonal() != 0, 1.0 / A_p.diagonal(), 0.0)
bvec = jnp.ones(n_pad, dtype=jnp.float32)


def jstep(op, u):
    return dia_pallas_jacobi(op, u, bvec, dinv, 0.8)


t_jac = _chained_time(jax, jnp, jstep, A_p, x, k=256)
out["jacobi_ms"] = round(t_jac * 1e3, 4)
# traffic: data + x + b + dinv reads + y write
traffic_j = (A_p.data.shape[0] * n_pad + 4 * n_pad) * 4
out["jacobi_gbs"] = round(traffic_j / t_jac / 1e9, 1)

# ---- 4. device-built hierarchy breakdown ------------------------------
dsa = device_sa_setup(A_dia, grid=grid, dtype=jnp.float32, max_coarse=400)
float(dsa.hierarchy.coarse_inv[0, 0])
h = dsa.hierarchy
out["levels"] = [
    {"n": int(l.n), "n_pad": int(l.n_pad), "fmt": type(l.A).__name__,
     "ndiags": getattr(l.A, "ndiags", None)} for l in h.levels]
one_cycle = _make_cycle(len(h.levels), "V")
b0 = jnp.ones(h.levels[0].n_pad, dtype=jnp.float32)
t_cyc = _chained_time(jax, jnp,
                      lambda o, v: one_cycle(o, jnp.zeros_like(v), v),
                      h, b0, k=64)
out["vcycle_ms"] = round(t_cyc * 1e3, 3)
out["profile_levels"] = profile_levels(dsa, k=64)

# truncated-tail variants: time a cycle over only the top L levels with a
# dense "exact tail" stub to size the coarse-tail overhead
for top in (2, 3):
    if len(h.levels) <= top:
        continue
    import copy
    from pyamg_tpu.engine.hierarchy import DeviceHierarchy, DeviceLevel
    from pyamg_tpu.engine import relaxation as dr
    lvls = list(h.levels[:top])
    tail_lvl = h.levels[top]
    nc_pad = tail_lvl.n_pad
    ident = dr.identity()
    lvls.append(DeviceLevel(A=tail_lvl.A, P=None, R=None, pre=ident,
                            post=ident, n=tail_lvl.n, n_pad=nc_pad))
    Mt = jnp.zeros((nc_pad, nc_pad), dtype=jnp.float32)
    h2 = DeviceHierarchy(levels=lvls, coarse_inv=Mt, nc=tail_lvl.n,
                         nc_pad=nc_pad, dtype=jnp.float32)
    oc2 = _make_cycle(len(lvls), "V")
    t2 = _chained_time(jax, jnp,
                       lambda o, v: oc2(o, jnp.zeros_like(v), v), h2, b0,
                       k=64)
    out[f"vcycle_top{top}_densetail_ms"] = round(t2 * 1e3, 3)

# ---- 5. batched K=8 per-stage amortization ----------------------------
K = 8
bK = jnp.ones((K, h.levels[0].n_pad), dtype=jnp.float32)
oc_b = jax.vmap(lambda o, v: one_cycle(o, jnp.zeros_like(v), v),
                in_axes=(None, 0))
t_cyc_K = _chained_time(jax, jnp, oc_b, h, bK, k=32)
out["vcycle_K8_ms"] = round(t_cyc_K * 1e3, 3)
out["vcycle_K8_amort"] = round(t_cyc * K / t_cyc_K, 2)

# per-stage K=8 on the finest level
l0 = h.levels[0]
xK = jnp.ones((K, l0.n_pad), dtype=jnp.float32)
stages = {
    "spmv": lambda o, v: o.levels[0].A @ v,
    "pre": lambda o, v: o.levels[0].pre(o.levels[0].A, v, v),
    "R": lambda o, v: jnp.pad(o.levels[0].R @ v,
                              (0, v.shape[0]
                               - (o.levels[0].R @ v).shape[0])),
}
for nm, st in stages.items():
    t1 = _chained_time(jax, jnp, st, h, b0, k=64)
    tk = _chained_time(jax, jnp,
                       jax.vmap(st, in_axes=(None, 0)), h, xK, k=32)
    out[f"stage_{nm}_1_ms"] = round(t1 * 1e3, 4)
    out[f"stage_{nm}_K8_ms"] = round(tk * 1e3, 4)
    out[f"stage_{nm}_amort"] = round(t1 * K / tk, 2)

out["total_s"] = round(time.time() - t_all, 1)
with open("/tmp/probe_r4_perf.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
