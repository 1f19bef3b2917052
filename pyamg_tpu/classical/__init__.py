"""Classical (Ruge-Stuben / AIR) AMG methods ([R] pyamg/classical/)."""

from . import interpolate, split
from .air import air_solver
from .classical import ruge_stuben_solver
from .cr import CR, binormalize

__all__ = [
    "interpolate",
    "split",
    "air_solver",
    "ruge_stuben_solver",
    "CR",
    "binormalize",
]
