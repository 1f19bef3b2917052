"""Visualization helpers ([R] pyamg/vis/, SURVEY.md §2.3)."""

from .vis_coarse import vis_aggregate_groups
from .vtk_writer import write_basic_mesh, write_vtu

__all__ = ["vis_aggregate_groups", "write_basic_mesh", "write_vtu"]
