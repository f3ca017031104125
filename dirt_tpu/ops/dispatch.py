"""Backend dispatch for the forward rasteriser.

Backends:
  * "pallas":    tile-binned Pallas TPU kernel (ops/forward_pallas.py); runs
                 in interpreter mode automatically off-TPU so tests exercise
                 the same kernel code on CPU.
  * "reference": brute-force XLA scan (ops/reference.py), the oracle.
  * None/"auto": pallas on TPU, reference elsewhere (fast for CPU tests).

Selection can be forced globally with the DIRT_TPU_BACKEND environment
variable.  Both backends implement the fragment semantics of ops/geometry.py:
winning-face maps match bit-exactly on tie-free scenes, interpolated values
to FMA-contraction rounding (the fused kernel shades in-kernel; the reference
backend shades via ops/reference.shade_pixels).
"""

import os

import jax
import jax.numpy as jnp

from . import reference


def on_accelerator():
    """True when the default jax backend is a TPU (including the 'axon'
    relay platform, whose backend name is not literally 'tpu').

    Deliberately NOT `!= "cpu"`: on a GPU-backed jax the TPU Pallas kernels
    (SMEM block specs, Mosaic compiler params) would be selected and fail to
    compile, so non-TPU accelerators fall back to the reference backend.
    """
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        return True
    # Relay/proxy platforms wrap a TPU but report a custom name; check the
    # device kind rather than hard-coding every alias.
    try:
        kind = jax.devices()[0].device_kind.lower()
    except (IndexError, RuntimeError):
        return False
    return "tpu" in kind


def default_backend():
    env = os.environ.get("DIRT_TPU_BACKEND", "auto")
    if env != "auto":
        return env
    return "pallas" if on_accelerator() else "reference"


def forward_batch(background, vertices, vertex_colors, faces, backend=None):
    """Rasterises a batch; returns (pixels [B,H,W,C], RasterAux [B,...])."""
    background = jnp.asarray(background, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    if background.ndim != 4:
        raise ValueError(f"background must be [B,H,W,C], got {background.shape}")
    if vertices.ndim != 3 or vertices.shape[-1] != 4:
        raise ValueError(f"vertices must be [B,V,4], got {vertices.shape}")
    if faces.ndim != 3 or faces.shape[-1] != 3:
        raise ValueError(f"faces must be [B,F,3], got {faces.shape}")
    if vertex_colors.shape[:2] != vertices.shape[:2]:
        raise ValueError(
            f"vertex_colors {vertex_colors.shape} does not match vertices "
            f"{vertices.shape}")
    if vertex_colors.shape[-1] != background.shape[-1]:
        raise ValueError(
            f"channel mismatch: vertex_colors {vertex_colors.shape} vs "
            f"background {background.shape}")

    chosen = backend or default_backend()
    if chosen == "reference":
        return reference.rasterise_batch(
            background, vertices, vertex_colors, faces)
    if chosen == "pallas":
        from . import forward_pallas
        return forward_pallas.rasterise_batch(
            background, vertices, vertex_colors, faces)
    if chosen == "dense":
        from . import forward_dense
        return forward_dense.rasterise_batch(
            background, vertices, vertex_colors, faces)
    raise ValueError(f"unknown backend {chosen!r}")
