"""Brute-force XLA rasteriser: the oracle for the Pallas kernels.

This plays the role the OpenGL hardware rasteriser plays for the reference
implementation (csrc/rasterise_egl.cpp:362-380): a slower but trusted
ground-truth whose fragment semantics are defined in ops/geometry.py.  It scans
every face against every pixel with a `lax.scan`, so it is O(F * H * W) but
fully vectorised over pixels and runs on any backend (tests run it on CPU).

The visibility result (winning face index per pixel) feeds the same
`shade_pixels` postprocess the Pallas path uses, so the two backends produce
bit-identical images whenever they agree on visibility.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import geometry


class RasterAux(NamedTuple):
    """Residuals the backward pass needs (the reference re-renders these in
    its grad op, csrc/rasterise_grad_egl.cpp:432-456; we emit them from the
    forward pass instead, avoiding the second rasterisation).

    ``dropped`` is the silent-cap diagnostic (SURVEY.md section 7 requires
    capped/binned schedules to surface truncation): the number of face
    visits this image's work schedule could NOT materialise -- faces beyond
    the per-tile face cap (forward_pallas/forward_dense, summed over tiles)
    or (tile, block) overlap hits beyond the CSR slot budget
    (forward_blocks).  Exact schedules report 0.  A non-zero count means
    geometry was dropped from the render: raise DIRT_TPU_TILE_FACE_CAP /
    DIRT_TPU_SLOTS_PER_IMAGE (or use an exact backend) and re-render.  The
    reference *errors* at its analogous cap (rasterise_grad_egl.cpp:399-405);
    we keep rendering degraded but make the degradation observable.
    """
    face_index: jnp.ndarray   # [*, H, W] int32, -1 where background
    indices: jnp.ndarray      # [*, H, W, 3] int32 vertex-index triple, -1 bg
    barycentric: jnp.ndarray  # [*, H, W, 3] perspective-correct, -1 bg
    clip_w: jnp.ndarray       # [*, H, W] fragment clip-space w, +inf bg
    dropped: jnp.ndarray = None  # [*] int32 dropped face visits (see above)


def visibility_scan(setup: geometry.FaceSetup, height, width):
    """Winning (depth, face index) per pixel by scanning faces in order.

    Args:
        setup: FaceSetup for a single image, leading dim [F].
        height, width: image size.

    Returns:
        best_index [H, W] int32 (-1 where no face wins).
    """
    x_ndc, y_ndc = geometry.pixel_centre_ndc(height, width)
    xg = x_ndc[None, :]
    yg = y_ndc[:, None]

    num_faces = setup.e.shape[0]
    # The zero-valued anchor makes the initial carry inherit the varying
    # manual axes of the face data, so this scan typechecks under
    # shard_map's check_vma without naming any mesh axis here (a plain
    # constant init would be device-invariant while the carry out is not).
    anchor = jnp.sum(setup.e) * 0.0
    init = (
        jnp.full((height, width), 1.0, jnp.float32) + anchor,  # glClearDepth(1.0)
        jnp.full((height, width), -1, jnp.int32) + anchor.astype(jnp.int32),
    )

    def body(carry, inputs):
        best_depth, best_index = carry
        face_idx, e, z, w, accept, valid = inputs
        covered, depth = geometry.fragment_cover_depth(
            e, z, w, accept, valid, xg, yg)
        # GL_LESS against the running buffer; ties go to the earliest face
        # (draw order), which lexicographic (depth, index) minimisation
        # reproduces exactly.
        better = covered & (
            (depth < best_depth)
            | ((depth == best_depth) & (face_idx < best_index)))
        return (
            jnp.where(better, depth, best_depth),
            jnp.where(better, face_idx, best_index),
        ), None

    (_, best_index), _ = jax.lax.scan(
        body, init,
        (jnp.arange(num_faces, dtype=jnp.int32),
         setup.e, setup.z, setup.w, setup.accept, setup.valid))
    return best_index


def shade_pixels(best_index, setup: geometry.FaceSetup, faces, vertex_colors,
                 background):
    """Interpolates attributes for the winning faces and composites.

    Shared by every forward backend so images are bit-identical across them.

    Args:
        best_index: [H, W] int32 winning face per pixel (-1 = background).
        setup: FaceSetup for the image ([F] leading dim).
        faces: [F, 3] int32.
        vertex_colors: [V, C].
        background: [H, W, C].

    Returns:
        (pixels [H, W, C], RasterAux).
    """
    height, width = best_index.shape

    if faces.shape[0] == 0:
        # Zero faces is an explicit no-op in the reference too
        # (rasterise_grad_egl.cu:41-42): pure background pass-through.
        return background, RasterAux(
            face_index=jnp.full((height, width), -1, jnp.int32),
            indices=jnp.full((height, width, 3), -1, jnp.int32),
            barycentric=jnp.full((height, width, 3), -1.0, jnp.float32),
            clip_w=jnp.full((height, width), jnp.inf, jnp.float32),
        )

    x_ndc, y_ndc = geometry.pixel_centre_ndc(height, width)
    xg = x_ndc[None, :]
    yg = y_ndc[:, None]

    covered = best_index >= 0
    safe_index = jnp.maximum(best_index, 0)

    e = jnp.take(setup.e, safe_index, axis=0)            # [H, W, 3, 3]
    w = jnp.take(setup.w, safe_index, axis=0)            # [H, W, 3]
    tri = jnp.take(faces, safe_index, axis=0)            # [H, W, 3]
    corner_colors = jnp.take(vertex_colors, tri, axis=0)  # [H, W, 3, C]

    interpolated = geometry.interpolate_attributes(e, xg, yg, corner_colors)
    pixels = jnp.where(covered[..., None], interpolated, background)

    bary, clip_w = geometry.fragment_barycentrics(e, xg, yg, w)
    aux = RasterAux(
        face_index=best_index,
        indices=jnp.where(covered[..., None], tri, -1),
        barycentric=jnp.where(covered[..., None], bary, -1.0),
        clip_w=jnp.where(covered, clip_w, jnp.inf),
    )
    return pixels, aux


def rasterise_single(background, vertices, vertex_colors, faces):
    """Rasterises a single image with the brute-force scan backend.

    Args:
        background: [H, W, C] float32.
        vertices: [V, 4] float32 clip-space positions.
        vertex_colors: [V, C] float32.
        faces: [F, 3] int32.

    Returns:
        (pixels [H, W, C], RasterAux).
    """
    background = jnp.asarray(background, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    height, width = background.shape[0], background.shape[1]
    setup = geometry.face_setup(vertices, faces)
    best_index = visibility_scan(setup, height, width)
    pixels, aux = shade_pixels(best_index, setup, faces, vertex_colors,
                               background)
    # The brute-force scan sweeps every face against every pixel: exact by
    # construction, nothing is ever dropped.
    return pixels, aux._replace(dropped=jnp.zeros((), jnp.int32))


def rasterise_batch(background, vertices, vertex_colors, faces):
    """Batched brute-force rasterisation ([B, ...] on every argument)."""
    return jax.vmap(rasterise_single)(
        jnp.asarray(background, jnp.float32),
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(vertex_colors, jnp.float32),
        jnp.asarray(faces, jnp.int32))
