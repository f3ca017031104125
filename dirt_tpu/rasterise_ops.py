"""Public differentiable rasterisation API (TPU-native).

API parity with the reference ``dirt/rasterise_ops.py``:

  * ``rasterise`` / ``rasterise_batch`` -- direct rasterisation with analytic
    filter-based gradients (dirt/rasterise_ops.py:13-108).
  * ``rasterise_deferred`` / ``rasterise_batch_deferred`` -- deferred shading
    whose backward pass invokes the gradient assembly twice: once filtering
    the *shaded* pixels (for vertex gradients) and once filtering the G-buffer
    with the shader-chained cotangent (for attribute/background gradients)
    (dirt/rasterise_ops.py:180-257).

Architectural differences from the reference (deliberate, TPU-first):
  * forward and backward fuse under one ``jax.custom_vjp``; the aux buffers
    (barycentrics, clip-w, vertex-index triples) are forward residuals instead
    of being re-rendered by a second op (csrc/rasterise_grad_egl.cpp:432-456).
  * arbitrary channel counts are rasterised natively in one pass -- no
    RGBA-driven channel splitting (dirt/rasterise_ops.py:86-108).  Gradients
    *do* replicate the reference's 3+1 channel grouping, because grouping
    changes the Scharr/dilation decisions and hence the gradient values.
  * ``shader_fn`` may safely close over traced tensors: ``jax.closure_convert``
    lifts them into explicit custom_vjp inputs so their gradients flow (the
    TPU-native answer to the reference's ``variables`` kwarg of
    ``tf.custom_gradient``, dirt/rasterise_ops.py:202,216-229, and the removal
    of its ``shader_additional_inputs`` caveat at dirt/rasterise_ops.py:279-283;
    the parameter is kept for API parity).
"""

import functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp

from .ops import backward as _backward
from .ops import dispatch as _dispatch

# Fused deferred backward (round 5): both halves of the deferred gradient
# in one kernel sweep (backward.rasterise_grad_deferred) instead of a
# parts="position" sweep plus a parts="color" sweep -- ALL G-buffer
# colour channels ride the first shaded group's sweep (colour reductions
# are per-channel independent; only the position half's Scharr is
# group-sensitive), with extra sweeps only for shaded images wider than
# one channel group.  Bitwise-equal to the grouped two-call path by
# construction; default ON after the device A/Bs (sweeps/_sweep_dbwd.py,
# BASELINE.md round-5: -18/-33/-42% by mesh size, -49% at a 7-channel
# G-buffer).
DEFERRED_FUSED = _os.environ.get("DIRT_TPU_DEFERRED_FUSED", "1") != "0"


def _int_cotangent(x):
    """Zero cotangent for integer inputs (jax requires dtype float0)."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


# ---------------------------------------------------------------------------
# Direct rasterisation
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _rasterise_batch_core(background, vertices, vertex_colors, faces, backend):
    pixels, _ = _dispatch.forward_batch(
        background, vertices, vertex_colors, faces, backend)
    return pixels


def _rasterise_fwd(background, vertices, vertex_colors, faces, backend):
    pixels, aux = _dispatch.forward_batch(
        background, vertices, vertex_colors, faces, backend)
    return pixels, (vertices, faces, pixels, aux)


def _rasterise_bwd(backend, residuals, grad_pixels):
    del backend
    vertices, faces, pixels, aux = residuals
    grad_background, grad_vertices, grad_vertex_colors = (
        _backward.rasterise_grad_grouped(
            vertices, faces, pixels, grad_pixels, aux))
    return (grad_background, grad_vertices, grad_vertex_colors,
            _int_cotangent(faces))


_rasterise_batch_core.defvjp(_rasterise_fwd, _rasterise_bwd)


def rasterise_batch(background, vertices, vertex_colors, faces, height=None,
                    width=None, channels=None, backend=None):
    """Rasterises a batch of meshes with common vertex/face counts.

    Args:
        background: float32 [batch, height, width, channels] image rendered
            behind the meshes.
        vertices: float32 [batch, vertex count, 4] clip-space positions
            (OpenGL conventions: the camera looks down -z in view space).
        vertex_colors: float32 [batch, vertex count, channels]; interpolated
            perspective-correctly across each triangle.
        faces: int32 [batch, face count, 3] vertex-index triples.
        height, width, channels: optional ints; validated against the static
            background shape when given (API parity with the reference, where
            they defined the native op's attributes).
        backend: optional "pallas" | "reference" override.

    Returns:
        float32 [batch, height, width, channels] rendered pixels, top row
        first.  Differentiable wrt background, vertices and vertex_colors
        (not faces), with filter-based boundary/occlusion gradients.
    """
    background = jnp.asarray(background, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    _check_hwc(background, height, width, channels)
    return _rasterise_batch_core(
        background, vertices, vertex_colors, faces, backend)


def rasterise(background, vertices, vertex_colors, faces, height=None,
              width=None, channels=None, backend=None):
    """Rasterises a single mesh over a background.

    Single-image variant of ``rasterise_batch`` (no leading batch dimension on
    any argument).  Reference: dirt/rasterise_ops.py:13-48.
    """
    return rasterise_batch(
        jnp.asarray(background, jnp.float32)[None],
        jnp.asarray(vertices, jnp.float32)[None],
        jnp.asarray(vertex_colors, jnp.float32)[None],
        jnp.asarray(faces, jnp.int32)[None],
        height, width, channels, backend)[0]


def rasterise_batch_with_aux(background, vertices, vertex_colors, faces,
                             backend=None):
    """Forward rasterisation returning the per-pixel aux diagnostics.

    Returns (pixels, RasterAux) for a batch.  RasterAux carries the
    backward-pass residuals (face index map, vertex-index triples,
    perspective-correct barycentrics, clip-w) plus ``dropped`` -- the
    silent-cap diagnostic: a per-image count of face visits the backend's
    work schedule could not materialise (per-tile face cap for the
    dense/pallas packings, CSR slot budget for the blocks backend; exact
    schedules report 0).  A non-zero ``dropped`` means the render is
    degraded: raise DIRT_TPU_TILE_FACE_CAP / DIRT_TPU_SLOTS_PER_IMAGE or
    switch backend, and re-render.

    This is a diagnostic/debug surface: the returned pixels are NOT hooked
    into the custom_vjp gradient path (use ``rasterise_batch`` for
    training).  The reference has no analogue -- it *errors* at its only
    cap (csrc/rasterise_grad_egl.cpp:399-405) -- but SURVEY.md section 7
    requires capped/binned schedules to surface truncation.
    """
    return _dispatch.forward_batch(
        jnp.asarray(background, jnp.float32),
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(vertex_colors, jnp.float32),
        jnp.asarray(faces, jnp.int32), backend)


def rasterise_grad_debug(background, vertices, vertex_colors, faces,
                         grad_pixels, backend=None, grad_implementation=None):
    """Runs the gradient assembly with its debug output exposed.

    The analogue of the reference grad op's `debug_thingy` image
    (csrc/rasterise_grad_egl.cpp:44, rasterise_grad_egl.cu:150-172): returns
    (grads, debug) where `debug` is a [height, width, 3] image whose channel
    0 marks pixels dilated to an occluder (1e-2) and channels 1/2 echo the
    incoming gradient's channels 1/2 (see ops/backward.debug_image), for
    visualising/diagnosing the occlusion-boundary behaviour.  All arguments
    are single-image.

    `grad_implementation` selects the gradient-assembly path: "pallas" (the
    size-based automatic Pallas-kernel choice production deploys on device),
    an explicit kernel name ("dense" / "blocks" / "mxu" / "xla"), or None for
    the platform-aware automatic choice -- so the debug surface shows what
    the deployed kernel actually did.  Unknown names raise ValueError.

    Returns:
        (RasteriseGrads namedtuple with unbatched fields, debug image).
    """
    pixels, aux = _dispatch.forward_batch(
        jnp.asarray(background, jnp.float32)[None],
        jnp.asarray(vertices, jnp.float32)[None],
        jnp.asarray(vertex_colors, jnp.float32)[None],
        jnp.asarray(faces, jnp.int32)[None], backend)
    grads = _backward.rasterise_grad_batch(
        jnp.asarray(vertices, jnp.float32)[None],
        jnp.asarray(faces, jnp.int32)[None],
        pixels, jnp.asarray(grad_pixels, jnp.float32)[None], aux,
        implementation=grad_implementation)
    unbatched = _backward.RasteriseGrads(
        *(field[0] for field in grads))
    return unbatched, unbatched.debug


def _check_hwc(background, height, width, channels):
    if height is not None and background.shape[-3] != height:
        raise ValueError(
            f"height {height} != background height {background.shape[-3]}")
    if width is not None and background.shape[-2] != width:
        raise ValueError(
            f"width {width} != background width {background.shape[-2]}")
    if channels is not None and background.shape[-1] != channels:
        raise ValueError(
            f"channels {channels} != background channels {background.shape[-1]}")


# ---------------------------------------------------------------------------
# Deferred shading
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5))
def _deferred_core(shader_fn, background, vertices, attributes, faces,
                   backend, shader_inputs):
    gbuffer, _ = _dispatch.forward_batch(
        background, vertices, attributes, faces, backend)
    return shader_fn(gbuffer, *shader_inputs)


def _deferred_fwd(shader_fn, background, vertices, attributes, faces, backend,
                  shader_inputs):
    gbuffer, aux = _dispatch.forward_batch(
        background, vertices, attributes, faces, backend)
    pixels = shader_fn(gbuffer, *shader_inputs)
    return pixels, (vertices, faces, gbuffer, pixels, aux, shader_inputs)


def _deferred_bwd(shader_fn, backend, residuals, grad_pixels):
    del backend
    vertices, faces, gbuffer, pixels, aux, shader_inputs = residuals

    # Attribute/background gradients flow through the shader first
    # (dirt/rasterise_ops.py:212-237).
    _, shader_vjp = jax.vjp(
        lambda gb, si: shader_fn(gb, *si), gbuffer, shader_inputs)
    grad_gbuffer, grad_shader_inputs = shader_vjp(grad_pixels)

    if DEFERRED_FUSED:
        # One kernel sweep computes BOTH halves: vertex gradients from
        # Scharr-filtering the *shaded* image (the correct boundary
        # gradients, dirt/rasterise_ops.py:204-210) and attribute/
        # background gradients from the G-buffer cotangent riding the
        # same sweep's colour rows.  Bitwise-equal to the two-call form
        # below.
        grad_background, grad_vertices, grad_attributes = (
            _backward.rasterise_grad_deferred(
                vertices, faces, pixels, grad_pixels, gbuffer,
                grad_gbuffer, aux))
    else:
        # Two-call form: parts="position" skips the colour reductions the
        # shaded-pixels call discards; parts="color" skips the vertex rows
        # AND the Scharr + dilation pre-pass (colour grads read
        # pre-dilation coverage).
        _, grad_vertices, _ = _backward.rasterise_grad_grouped(
            vertices, faces, pixels, grad_pixels, aux, parts="position")
        grad_background, _, grad_attributes = (
            _backward.rasterise_grad_grouped(
                vertices, faces, gbuffer, grad_gbuffer, aux, parts="color"))

    return (grad_background, grad_vertices, grad_attributes,
            _int_cotangent(faces), grad_shader_inputs)


_deferred_core.defvjp(_deferred_fwd, _deferred_bwd)


def rasterise_batch_deferred(background_attributes, vertices,
                             vertex_attributes, faces, shader_fn,
                             shader_additional_inputs=(), backend=None):
    """Rasterises a G-buffer of vertex attributes, then shades it per pixel.

    Equivalent to ``shader_fn(rasterise_batch(background_attributes, vertices,
    vertex_attributes, faces), *shader_additional_inputs)`` but with gradients
    that correctly account for how the approximate rasteriser gradients
    interact with the shader (see module docstring and
    dirt/rasterise_ops.py:260-333).

    ``shader_fn`` takes the batched G-buffer [batch, height, width, attrs] and
    the values of ``shader_additional_inputs``, and returns the final pixels
    [batch, height, width, channels].  Traced tensors the shader closes over
    are lifted into explicit inputs via ``jax.closure_convert``, so their
    gradients flow exactly as if they had been passed through
    ``shader_additional_inputs`` (which remains supported for API parity with
    the reference, dirt/rasterise_ops.py:279-283).
    """
    background_attributes = jnp.asarray(background_attributes, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_attributes = jnp.asarray(vertex_attributes, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    shader_inputs = tuple(jnp.asarray(s) for s in shader_additional_inputs)
    # Lift traced tensors shader_fn closes over into explicit inputs so their
    # cotangents cross the custom_vjp boundary (SURVEY.md section 7; the
    # reference handles this with tf.custom_gradient's `variables` kwarg,
    # dirt/rasterise_ops.py:202,216-229).  The G-buffer has exactly the
    # background's shape/dtype, so it serves as the abstract example input.
    # Concrete (non-traced) closure values are left in place.
    converted_fn, hoisted = jax.closure_convert(
        lambda gb, *si: shader_fn(gb, *si),
        background_attributes, *shader_inputs)
    return _deferred_core(converted_fn, background_attributes, vertices,
                          vertex_attributes, faces, backend,
                          shader_inputs + tuple(hoisted))


def rasterise_deferred(background_attributes, vertices, vertex_attributes,
                       faces, shader_fn, shader_additional_inputs=(),
                       backend=None):
    """Single-image deferred shading; see ``rasterise_batch_deferred``.

    ``shader_fn`` here takes an *unbatched* G-buffer [height, width, attrs],
    as in the reference (dirt/rasterise_ops.py:260-310).
    """
    batched_shader = lambda gbuffer, *inputs: shader_fn(gbuffer[0], *inputs)[None]
    return rasterise_batch_deferred(
        jnp.asarray(background_attributes, jnp.float32)[None],
        jnp.asarray(vertices, jnp.float32)[None],
        jnp.asarray(vertex_attributes, jnp.float32)[None],
        jnp.asarray(faces, jnp.int32)[None],
        batched_shader, shader_additional_inputs, backend)[0]
