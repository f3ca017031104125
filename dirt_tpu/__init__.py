"""dirt_tpu: a TPU-native differentiable rasterisation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of pmh47/dirt
("DIRT: a fast Differentiable Renderer for TensorFlow"): hardware-speed
triangle rasterisation with analytic, filter-based derivatives that behave
correctly at occlusion boundaries, plus the surrounding scene-math library
(transform matrices, projection/unprojection, mesh normals, Gouraud and
deferred shading models).

Public entry points (API parity with dirt/__init__.py:2):
    rasterise, rasterise_batch, rasterise_deferred, rasterise_batch_deferred
plus the helper modules ``matrices``, ``projection`` and ``lighting``.
"""

from . import lighting, matrices, projection
from .rasterise_ops import (
    rasterise,
    rasterise_batch,
    rasterise_batch_deferred,
    rasterise_batch_with_aux,
    rasterise_deferred,
    rasterise_grad_debug,
)

__all__ = [
    "rasterise",
    "rasterise_batch",
    "rasterise_deferred",
    "rasterise_batch_deferred",
    "rasterise_batch_with_aux",
    "rasterise_grad_debug",
    "matrices",
    "projection",
    "lighting",
]

__version__ = "0.1.0"
