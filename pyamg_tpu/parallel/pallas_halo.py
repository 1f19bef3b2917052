"""Pallas remote-DMA halo-exchange SpMV (compute/communication overlap).

The BASELINE.json:5 headline communication design: "halo vector exchange
via jax.lax collectives overlapped with local SpMV compute ... Pallas
make_async_remote_copy remote DMA for the compute-overlapped halo path"
(SURVEY.md §2.5 / §5).  One kernel instance per shard (shard_map):

1. copy the local x block into the middle of an extended VMEM buffer;
2. start RDMA of the boundary slices to both ring neighbors' halo slots;
3. compute the *interior* rows (which need no halo) while the DMAs fly;
4. wait on the receive semaphores, then compute the boundary rows.

On a single device the ring degenerates to self-sends, which reproduces
the wrap-around of plain rolled-DIA SpMV exactly (out-of-range entries
store zero).

STATUS: EXPERIMENTAL.  This environment's remote-compile helper (chipless
v5e:1x1x1 AOT topology) rejects kernels containing make_async_remote_copy,
so the kernel cannot be executed here; it encodes the intended multi-chip
design for validation on a real slice.  The production distributed paths
are the GSPMD sharding (parallel.partition — DIA rolls lower to
collective-permute) and the explicit ppermute shard_map SpMV
(parallel.dist_spmv), both tested.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.experimental import pallas as pl
from jax.sharding import NamedSharding, PartitionSpec as P

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from ..sparse import DIAMatrix
from .dist_spmv import halo_width

__all__ = ["make_pallas_halo_spmv"]

_LANES = 128


def make_pallas_halo_spmv(dia: DIAMatrix, mesh, axis="x", interpret=False):
    """Build the overlapped halo-exchange SpMV for a row-sharded DIA A.

    Returns ``(spmv, place)`` like make_halo_dia_spmv; requires the TPU
    backend, n_pad divisible by (mesh size * 128) and halo a multiple-of
    -128-coverable width (rounded up internally).

    ``interpret=True`` runs the kernel under the Pallas TPU interpreter
    (pltpu.InterpretParams), which SIMULATES the remote DMAs and
    semaphores on CPU devices — this is how the kernel's numerics
    (including the ring-neighbor indexing in steps 2-4) are validated on
    the virtual multi-device mesh without TPU slice hardware
    (tests/test_parallel.py::test_pallas_halo_spmv_interpret).
    """
    if pltpu is None:
        raise RuntimeError("pallas TPU backend unavailable")
    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names if a == axis]))
    n_pad = dia.n_pad
    if n_pad % (ndev * _LANES) != 0:
        raise ValueError("n_pad must be divisible by mesh_size*128")
    n_local = n_pad // ndev
    halo = -(-halo_width(dia) // _LANES) * _LANES      # round up to 128
    if halo > n_local:
        raise ValueError("halo exceeds local block")
    offsets = dia.offsets
    ndiags = len(offsets)
    n_ext = n_local + 2 * halo

    def kernel(x_ref, data_ref, y_ref, xext, dvm, yv, sems, send_sems,
               recv_sems):
        my_id = lax.axis_index(axis)
        # np.int32 literals: under jax_enable_x64 python ints promote to
        # i64, which mismatches axis_index's i32 (and Mosaic cannot
        # legalize i64 anyway — CLAUDE.md backend rule 3)
        nd = np.int32(ndev)
        one = np.int32(1)
        left = lax.rem(my_id - one + nd, nd)
        right = lax.rem(my_id + one, nd)

        # 1. local x and diagonal data -> VMEM
        cp_x = pltpu.make_async_copy(x_ref, xext.at[pl.ds(halo, n_local)],
                                     sems.at[0])
        cp_d = pltpu.make_async_copy(data_ref, dvm, sems.at[1])
        cp_x.start()
        cp_d.start()
        cp_x.wait()

        # 2. boundary slices -> neighbors' halo slots (RDMA, in flight
        # during interior compute)
        rdma_r = pltpu.make_async_remote_copy(
            src_ref=xext.at[pl.ds(n_local, halo)],
            dst_ref=xext.at[pl.ds(0, halo)],
            send_sem=send_sems.at[0],
            recv_sem=recv_sems.at[0],
            device_id=(right,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma_l = pltpu.make_async_remote_copy(
            src_ref=xext.at[pl.ds(halo, halo)],
            dst_ref=xext.at[pl.ds(halo + n_local, halo)],
            send_sem=send_sems.at[1],
            recv_sem=recv_sems.at[1],
            device_id=(left,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rdma_r.start()
        rdma_l.start()
        cp_d.wait()

        # 3. interior rows [halo, n_local - halo): no ghost data needed
        interior = n_local - 2 * halo
        if interior > 0:
            acc = jnp.zeros((interior,), dtype=jnp.float32)
            for d, off in enumerate(offsets):
                seg = xext[2 * halo + off: 2 * halo + off + interior]
                acc = acc + dvm[d, halo: halo + interior] * seg
            yv[pl.ds(halo, interior)] = acc

        # 4. halos arrived -> boundary rows
        rdma_r.wait()
        rdma_l.wait()
        accl = jnp.zeros((halo,), dtype=jnp.float32)
        acch = jnp.zeros((halo,), dtype=jnp.float32)
        base = n_local - halo
        for d, off in enumerate(offsets):
            accl = accl + dvm[d, 0:halo] * xext[halo + off: 2 * halo + off]
            acch = acch + dvm[d, base: base + halo] * \
                xext[halo + base + off: 2 * halo + base + off]
        yv[pl.ds(0, halo)] = accl
        yv[pl.ds(base, halo)] = acch

        # 5. result -> output
        cp_y = pltpu.make_async_copy(yv, y_ref, sems.at[0])
        cp_y.start()
        cp_y.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((n_ext,), jnp.float32),
            pltpu.VMEM((ndiags, n_local), jnp.float32),
            pltpu.VMEM((n_local,), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    call_kwargs = {}
    if interpret:
        call_kwargs["interpret"] = pltpu.InterpretParams()

    def local_call(data_loc, x_loc):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((n_local,), jnp.float32),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            **call_kwargs,
        )(x_loc, data_loc)

    fn = shard_map(
        local_call, mesh=mesh,
        in_specs=(P(None, axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    spmv = jax.jit(fn)

    def place(x):
        return jax.device_put(jnp.asarray(x, jnp.float32),
                              NamedSharding(mesh, P(axis)))

    return spmv, place
