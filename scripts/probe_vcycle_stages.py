"""Precise single-RHS V-cycle stage breakdown (round 4, VERDICT item 4).

Times every stage of the device-built 2048^2 SA V-cycle with k=256
dependent chains and reports NET times (RTT/k subtracted) so effort
goes where the measured milliseconds are.  Writes
/tmp/probe_vstages.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _chained_time, _measure_rtt
from pyamg_tpu.engine import device_sa_setup
from pyamg_tpu.engine.solver import _make_cycle
from pyamg_tpu.sparse import dia_from_stencil

out = {"backend": jax.default_backend()}
grid = (2048, 2048)
S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A = dia_from_stencil(S1, grid, dtype=jnp.float32)
dsa = device_sa_setup(A, grid=grid, dtype=jnp.float32, max_coarse=400)
h = dsa.hierarchy
float(h.coarse_inv[0, 0])
rtt = _measure_rtt(jax, jnp)
out["rtt_ms"] = round(rtt * 1e3, 3)
out["levels"] = [int(l.n_pad) for l in h.levels]


def net(fn, v, k=256):
    t = _chained_time(jax, jnp, fn, h, v, k=k)
    return round((t - rtt / k) * 1e3, 4)


kms = {}
# whole cycle reference
one_cycle = _make_cycle(len(h.levels), "V")
b0 = jnp.ones(h.levels[0].n_pad, dtype=jnp.float32)
kms["vcycle"] = net(lambda o, v: one_cycle(o, jnp.zeros_like(v), v), b0,
                    k=64)
kms["vcycle_zero"] = net(lambda o, v: one_cycle.zero(o, v), b0, k=64)

for i in (0, 1):
    lvl = i
    n_pad = h.levels[i].n_pad
    v = jnp.ones(n_pad, dtype=jnp.float32)
    nc_pad = h.levels[i + 1].n_pad

    def zero_call(o, v, i=i):
        l = o.levels[i]
        return l.pre.zero_call(l.A, v)

    def full_smooth(o, v, i=i):
        l = o.levels[i]
        return l.post(l.A, v, v)

    def residual(o, v, i=i):
        l = o.levels[i]
        return v - (l.A @ v)

    def restrict_full(o, v, i=i, nc_pad=nc_pad):
        l = o.levels[i]
        y = l.R @ v
        return jnp.pad(y, (0, v.shape[0] - y.shape[0]))

    def spmv_scaled(o, v, i=i):
        from pyamg_tpu.sparse.dia import dia_spmv_scaled
        l = o.levels[i]
        R = l.R
        return dia_spmv_scaled(R.St, v, R.tv)

    def blocksum_pad(o, v, i=i):
        from pyamg_tpu.engine.device_setup import (_block_sum,
                                                   _grid_pad_vec)
        l = o.levels[i]
        R = l.R
        nf = int(np.prod(R.fine_grid_p))
        yc = _block_sum(v[:nf], R.coarse_grid, R.stride)
        y = _grid_pad_vec(yc, R.coarse_grid, R.coarse_grid_p)
        return jnp.pad(y, (0, v.shape[0] - y.shape[0]))

    def prolong_corr(o, v, i=i, nc_pad=nc_pad):
        l = o.levels[i]
        return l.P.apply_correction(v[:nc_pad], v)

    def smooth_input(o, v, i=i, nc_pad=nc_pad):
        l = o.levels[i]
        t = l.P._smooth_input(v[:nc_pad])
        return jnp.pad(t, (0, v.shape[0] - t.shape[0]))

    def spmv_add(o, v, i=i):
        from pyamg_tpu.sparse.dia import dia_spmv_add
        l = o.levels[i]
        return dia_spmv_add(l.P.S, v, v)

    def zero_res(o, v, i=i):
        l = o.levels[i]
        out = l.pre.zero_call_residual(l.A, v)
        x, r = out
        return x + r

    for nm, st in [("zero_call", zero_call), ("jacobi", full_smooth),
                   ("residual", residual), ("zero_res_fused", zero_res),
                   ("restrict", restrict_full),
                   ("spmv_scaled", spmv_scaled),
                   ("blocksum_pad", blocksum_pad),
                   ("smooth_input", smooth_input),
                   ("spmv_add", spmv_add),
                   ("prolong_corr", prolong_corr)]:
        try:
            kms[f"L{i}_{nm}"] = net(st, v)
        except Exception as e:
            kms[f"L{i}_{nm}"] = f"err: {str(e)[:120]}"
        print(f"L{i}_{nm}", kms[f"L{i}_{nm}"], flush=True)

# tail: levels >= 2 as one chained sub-cycle (what does the whole tail
# cost?)
sub = _make_cycle(len(h.levels) - 2, "V")


def tail(o, v):
    import jax.tree_util as jtu
    from pyamg_tpu.engine.hierarchy import DeviceHierarchy
    h2 = DeviceHierarchy(levels=o.levels[2:], coarse_inv=o.coarse_inv,
                         nc=o.nc, nc_pad=o.nc_pad, dtype=o.dtype,
                         A64=None)
    return sub(h2, jnp.zeros_like(v), v)


v2 = jnp.ones(h.levels[2].n_pad, dtype=jnp.float32)
try:
    kms["tail_from_L2"] = net(tail, v2, k=128)
except Exception as e:
    kms["tail_err"] = str(e)[:200]

out["ms"] = kms
print(json.dumps(out), flush=True)
json.dump(out, open("/tmp/probe_vstages.json", "w"), indent=1)
