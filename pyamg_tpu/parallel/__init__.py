"""Distributed execution over jax.sharding meshes (SURVEY.md §2.5 / §7 step 7).

The reference is serial; distribution is a first-class NEW subsystem here:
every level's operators are row/block-partitioned over a 1-D device mesh
axis ('x'), vectors are row-sharded, Krylov reductions become psum
collectives, and SpMV neighbor access rides XLA-inserted collectives
(GSPMD baseline) or explicit halo exchange (shard_map path).
"""

from .dist_spmv import halo_width, make_halo_dia_spmv
from .multihost import initialize_distributed
from .partition import (
    make_solver_mesh,
    shard_hierarchy,
    shard_vector,
)

__all__ = [
    "halo_width",
    "make_halo_dia_spmv",
    "initialize_distributed",
    "make_solver_mesh",
    "shard_hierarchy",
    "shard_vector",
]
