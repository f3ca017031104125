"""Rasterisation core: geometry math, forward backends, gradient assembly."""

from . import backward, dispatch, geometry, reference

__all__ = ["backward", "dispatch", "geometry", "reference"]
