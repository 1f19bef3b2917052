"""Rotated anisotropic diffusion stencils.

Rebuild of [R] pyamg/gallery/diffusion.py::diffusion_stencil_2d
(SURVEY.md §2.3): discretizations of
    -div(Q^T diag(1, eps) Q grad(u)),  Q = rotation by theta,
i.e. - (c^2 + eps s^2) u_xx - 2 (1 - eps) c s u_xy - (eps c^2 + s^2) u_yy.
"""

from __future__ import annotations

import numpy as np

from .stencil import stencil_grid

__all__ = ["diffusion_stencil_2d"]


def diffusion_stencil_2d(epsilon=1.0, theta=0.0, type="FE"):
    """Return the 3x3 stencil for rotated anisotropic diffusion."""
    eps = float(epsilon)
    c = np.cos(theta)
    s = np.sin(theta)
    cc = c * c
    ss = s * s
    cs = c * s

    if type == "FE":
        a = (-1 * eps - 1) * cc + (-1 * eps - 1) * ss + (3 * eps - 3) * cs
        b = (2 * eps - 4) * cc + (-4 * eps + 2) * ss
        cpt = (-1 * eps - 1) * cc + (-1 * eps - 1) * ss + (-3 * eps + 3) * cs
        d = (-4 * eps + 2) * cc + (2 * eps - 4) * ss
        e = (8 * eps + 8) * cc + (8 * eps + 8) * ss
        stencil = np.array(
            [[a, d, cpt],
             [b, e, b],
             [cpt, d, a]]
        ) / 6.0
    elif type == "FD":
        # second-order FD; cross term via centered four-corner stencil
        a = 0.5 * (eps - 1) * cs
        b = -(eps * ss + cc)
        cpt = -a
        d = -(eps * cc + ss)
        e = 2.0 * (eps + 1)
        stencil = np.array(
            [[a, d, cpt],
             [b, e, b],
             [cpt, d, a]]
        )
    else:
        raise ValueError("type must be 'FE' or 'FD'")
    return stencil
