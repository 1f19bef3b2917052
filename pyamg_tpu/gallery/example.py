"""Named example problems.

Rebuild of [R] pyamg/gallery/example.py::load_example (SURVEY.md §2.3).
The reference ships .mat datasets (airfoil, bar, knot, recirc_flow, ...);
those binary files are unavailable in this build, so each name is backed
by a deterministic *generator* producing a matrix with the same character
(documented per entry).  The dict layout matches the reference:
``load_example(name) -> {'A': ..., 'B': ..., 'vertices': ..., 'elements': ...}``
with keys present where meaningful.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp

from .advection import recirc_flow
from .diffusion import diffusion_stencil_2d
from .elasticity import linear_elasticity_p1
from .laplacian import poisson
from .mesh import regular_triangle_mesh
from .stencil import stencil_grid

__all__ = ["load_example", "example_names"]


def _fem_poisson_p1(nx, ny):
    from ..gallery.fem import gradgradform

    V, E = regular_triangle_mesh(nx, ny)
    A = gradgradform(V, E)
    return A, V, E


def example_names():
    return sorted(_GENERATORS.keys())


def _airfoil():
    # unstructured-flavored anisotropic FE diffusion (stand-in for the
    # airfoil mesh dataset)
    V, E = regular_triangle_mesh(40, 40)
    rng = np.random.default_rng(5)
    interior = ((V[:, 0] > 0) & (V[:, 0] < 1) & (V[:, 1] > 0) & (V[:, 1] < 1))
    V = V + 0.25 / 40 * rng.standard_normal(V.shape) * interior[:, None]
    from .fem import gradgradform

    A = gradgradform(V, E)
    return {"A": A, "vertices": V, "elements": E}


def _bar():
    from .elasticity import linear_elasticity

    A, B = linear_elasticity((8, 40), format="bsr")
    return {"A": A, "B": B}


def _knot():
    # ill-conditioned SPD surrogate
    A = poisson((60, 60), format="csr")
    d = 1.0 + 10.0 * np.abs(np.sin(7.0 * np.arange(A.shape[0])))
    D = sp.dia_matrix((d.reshape(1, -1), [0]), shape=A.shape)
    A = (D @ A @ D).tocsr()
    return {"A": A}


def _local_disc_galerkin_diffusion():
    # block-structured diffusion surrogate (DG has multiple dofs/element)
    A = poisson((32, 32), format="csr")
    A = sp.kron(A, sp.identity(4), format="bsr")
    A = A.tobsr(blocksize=(4, 4))
    B = np.ones((A.shape[0], 1))
    return {"A": A, "B": B}


def _recirc_flow():
    A = recirc_flow((50, 50), epsilon=1e-2)
    return {"A": A}


def _unit_square():
    A, V, E = _fem_poisson_p1(30, 30)
    return {"A": A, "vertices": V, "elements": E}


def _unit_cube():
    A = poisson((12, 12, 12), format="csr")
    return {"A": A}


_GENERATORS = {
    "airfoil": _airfoil,
    "bar": _bar,
    "knot": _knot,
    "local_disc_galerkin_diffusion": _local_disc_galerkin_diffusion,
    "recirc_flow": _recirc_flow,
    "unit_square": _unit_square,
    "unit_cube": _unit_cube,
}


def load_example(name):
    """Load a named example problem as a dict (see module docstring)."""
    if name not in _GENERATORS:
        raise ValueError(
            f"no example named {name!r}; available: {example_names()}"
        )
    return _GENERATORS[name]()
