"""Utility modules ([R] pyamg/util/, SURVEY.md §2.3)."""

from . import linalg, utils

__all__ = ["linalg", "utils"]
