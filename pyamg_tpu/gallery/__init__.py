"""Gallery of canonical test problems ([R] pyamg/gallery/, SURVEY.md §2.3)."""

from .advection import advection_2d, recirc_flow
from .demo import demo
from .diffusion import diffusion_stencil_2d
from .elasticity import linear_elasticity, linear_elasticity_p1
from .example import example_names, load_example
from .fem import gradgradform, refine_mesh
from .laplacian import gauge_laplacian, poisson
from .mesh import regular_triangle_mesh
from .random_sparse import sprand
from .stencil import stencil_grid

__all__ = [
    "advection_2d",
    "recirc_flow",
    "demo",
    "diffusion_stencil_2d",
    "linear_elasticity",
    "linear_elasticity_p1",
    "example_names",
    "load_example",
    "gradgradform",
    "refine_mesh",
    "gauge_laplacian",
    "poisson",
    "regular_triangle_mesh",
    "sprand",
    "stencil_grid",
]
