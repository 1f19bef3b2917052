"""Decompose the batched (K=8) restriction/prolongation cost at 4.2M:
which sub-op fails to amortize under vmap?  Writes
/tmp/probe_batched2.json."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import _chained_time, _measure_rtt
from pyamg_tpu.engine.device_setup import (_block_sum, _broadcast_coarse,
                                           _embed_coarse, _grid_pad_vec,
                                           _grid_unpad_vec)
from pyamg_tpu.sparse import dia_from_stencil
from pyamg_tpu.engine.device_setup import _solve_pad
from pyamg_tpu.sparse import DIAMatrix

out = {"backend": jax.default_backend(),
       "rtt_ms": round(_measure_rtt(jax, jnp) * 1e3, 2)}
K = 8
cg = (683, 683)
stride = 3
fine = (2049, 2049)
nf = fine[0] * fine[1]
nc = cg[0] * cg[1]

S1 = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=float)
A_dia = dia_from_stencil(S1, (2048, 2048), dtype=jnp.float32)
n_pad = _solve_pad(A_dia.n_pad)
St = DIAMatrix(data=jnp.pad(A_dia.data, ((0, 0), (0, n_pad - A_dia.n_pad))),
               offsets=A_dia.offsets, shape=A_dia.shape, nnz=A_dia.nnz)

x1 = jnp.ones(n_pad, dtype=jnp.float32)
xK = jnp.ones((K, n_pad), dtype=jnp.float32)
xf1 = jnp.ones(nf, dtype=jnp.float32)
xfK = jnp.ones((K, nf), dtype=jnp.float32)
xc1 = jnp.ones(nc, dtype=jnp.float32)
xcK = jnp.ones((K, nc), dtype=jnp.float32)

def _wrap2(f):
    vf = jax.vmap(f)
    return lambda o, v: vf(v)


def tpair(name, f1, fK, v1, vK, k=64):
    t1 = _chained_time(jax, jnp, f1, None, v1, k=k)
    tk = _chained_time(jax, jnp, fK, None, vK, k=k // 2)
    out[f"{name}_1_ms"] = round(t1 * 1e3, 4)
    out[f"{name}_K8_ms"] = round(tk * 1e3, 4)
    out[f"{name}_amort"] = round(t1 * K / tk, 2)

# direct K-major fused DIA matmat (no vmap) vs single
tpair("dia_spmv_direct",
      lambda o, v: St @ (v * 1.0000001),
      lambda o, v: St.matmat_k(v * 1.0000001),
      x1, xK)
# vmapped DIA matvec (through the custom_vmap rule)
tpair("dia_spmv_vmap",
      lambda o, v: St @ (v * 1.0000001),
      _wrap2(lambda v: St @ (v * 1.0000001)),
      x1, xK)
# block_sum (reduce_window stride 3)
tpair("block_sum",
      lambda o, v: jnp.pad(_block_sum(v * 1.0000001, cg, stride),
                           (0, nf - nc)),
      _wrap2(lambda v: jnp.pad(_block_sum(v * 1.0000001, cg, stride),
                                 (0, nf - nc))),
      xf1, xfK)
# embed (interior pad)
tpair("embed",
      lambda o, v: _embed_coarse(v * 1.0000001, cg, stride, 1)[:nc],
      _wrap2(lambda v: _embed_coarse(v * 1.0000001, cg, stride, 1)[:nc]),
      xc1, xcK)
# broadcast (now embed+reduce_window)
tpair("broadcast",
      lambda o, v: _broadcast_coarse(v * 1.0000001, cg, stride, 1)[:nc],
      _wrap2(lambda v: _broadcast_coarse(v * 1.0000001, cg, stride,
                                           1)[:nc]),
      xc1, xcK)
# grid pad/unpad
tpair("grid_pad",
      lambda o, v: _grid_pad_vec(v[:nc] * 1.0000001, cg, (688, 688))[:nc],
      _wrap2(lambda v: _grid_pad_vec(v[:nc] * 1.0000001, cg,
                                       (688, 688))[:nc]),
      xc1, xcK)

with open("/tmp/probe_batched2.json", "w") as f:
    json.dump(out, f, indent=1, default=float)
print(json.dumps(out, default=float))
