"""Analytic gradient assembly: filter-based derivatives with occluder dilation.

Reproduces the reference's gradient kernel (csrc/rasterise_grad_egl.cu:93-236)
semantics exactly, as fully-vectorised XLA ops:

  1. 3x3 Scharr filtering of the forward-rendered pixels (weights 3/32 and
     10/32, negative-offset minus positive-offset, edge-clamped reads) to
     estimate d pixel / d fragment-position, which makes boundary and
     occlusion gradients non-zero (rasterise_grad_egl.cu:113-127).
  2. Colour gradients: bary-weighted scatter of grad_pixels to the covering
     triangle's vertices, or pass-through to grad_background
     (rasterise_grad_egl.cu:134-148).  Uses *pre-dilation* barycentrics.
  3. Occlusion-boundary dilation: interior pixels look along the dominant
     Scharr axis (sign dithered by pixel parity) and adopt the neighbour's
     (barycentric, indices, clip_w) if that neighbour lies over a different,
     nearer triangle -- so boundary gradients flow to the occluder
     (rasterise_grad_egl.cu:153-194).
  4. Position gradients: dL/d(fragment x, y) from the Scharr responses, the
     fragment's clip x, y reconstructed from (post-dilation) barycentrics,
     chained through the viewport transform with
     d_xview/d_xclip = (W/2)/clip_w and d_xview/d_wclip = -(W/2) clip_x/clip_w^2,
     scattered bary-weighted into grad_vertices components {x, y, w}.  No
     gradient flows to clip z (rasterise_grad_egl.cu:196-232) or to faces.

The reference's atomicAdd scatters become `jax.ops.segment_sum` (sort-based on
TPU); its CUDA surface reads of re-rendered aux buffers become reads of the
RasterAux residuals the forward pass already produced.

Known deliberate deviation: for channels < 3 the reference's Scharr Vec3 reads
channels 1 and 2 out of bounds (adjacent-pixel memory) and feeds that garbage
into the dilation-direction L1 norms (rasterise_grad_egl.cu:119-127,185); we
use only the real channels.  For channels == 3 (the common case) behaviour is
identical.
"""

import functools
import os as _os
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Opt-in improved occluder dilation (round-4 stretch): after the
# reference's two axial attempts, also try the four diagonal neighbours
# (parity-dithered order).  The reference documents diagonal neighbours as
# an unhandled limitation (rasterise_grad_egl.cu:176-183); default OFF for
# gradient parity with it.  Enabling forces the XLA pre-pass (the fused
# Pallas pre-pass implements the two-attempt reference semantics only).
# Quality A/B on the cylinder scene: sweeps/_ab_dilation.py / BASELINE.md.
DIAGONAL = _os.environ.get("DIRT_TPU_DIAGONAL_DILATION", "0") != "0"


class RasteriseGrads(NamedTuple):
    grad_background: jnp.ndarray     # [H, W, C]
    grad_vertices: jnp.ndarray       # [V, 4]
    grad_vertex_colors: jnp.ndarray  # [V, C]
    debug: jnp.ndarray               # [H, W, 3] debug_thingy (see debug_image)


def debug_image(dilated, grad_pixels):
    """The reference grad op's `debug_thingy` image
    (rasterise_grad_egl.cu:150-151,172): channel 0 marks pixels whose
    gradients were dilated to an occluder (1e-2), channels 1 and 2 echo the
    incoming pixel-gradient channels 1 and 2.  When the cotangent has fewer
    than 3 channels the echoed channels stay 0 (the reference indexes its
    grad tensor out of bounds there; deliberate deviation, as for the
    Scharr Vec3 reads -- module docstring).

    Args may be batched or not: dilated [*, H, W] bool,
    grad_pixels [*, H, W, C].  Returns [*, H, W, 3] float32.
    """
    marker = jnp.where(dilated, 1.e-2, 0.0)
    channels = grad_pixels.shape[-1]
    ch1 = grad_pixels[..., 1] if channels > 1 else jnp.zeros_like(marker)
    ch2 = grad_pixels[..., 2] if channels > 2 else jnp.zeros_like(marker)
    return jnp.stack([marker, ch1, ch2], axis=-1)


def _shift(array, ox, oy, fill):
    """array indexed [H, W, ...]; returns a[r - oy, c + ox] with `fill` OOB.

    Matches the reference's offset convention: `at(ox, oy)` reads image row
    (r - oy), column (c + ox) (rasterise_grad_egl.cu:113-118,161 -- the y
    negation reflects the GL-vs-image vertical flip).
    """
    h, w = array.shape[0], array.shape[1]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (array.ndim - 2)
    padded = jnp.pad(array, pad, constant_values=fill)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(padded, 1 - oy, h, axis=0),
        1 + ox, w, axis=1)


def _shift_clamped(array, ox, oy):
    """Like _shift but edge-clamped (for Scharr's out-of-bounds reads)."""
    h, w = array.shape[0], array.shape[1]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (array.ndim - 2)
    padded = jnp.pad(array, pad, mode='edge')
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(padded, 1 - oy, h, axis=0),
        1 + ox, w, axis=1)


def scharr_filters(pixels):
    """3x3 Scharr responses of [H, W, C] pixels.

    Note the filters are negative-offset minus positive-offset
    (rasterise_grad_egl.cu:125-127).
    """
    at = lambda ox, oy: _shift_clamped(pixels, ox, oy)
    scharr_x = ((at(-1, -1) + at(-1, +1) - at(+1, -1) - at(+1, +1)) * (3. / 32.)
                + (at(-1, 0) - at(+1, 0)) * (10. / 32.))
    scharr_y = ((at(-1, -1) + at(+1, -1) - at(-1, +1) - at(+1, +1)) * (3. / 32.)
                + (at(0, -1) - at(0, +1)) * (10. / 32.))
    return scharr_x, scharr_y


def _dilate(indices, barycentric, clip_w, scharr_x, scharr_y,
            face_index=None):
    """Occlusion-boundary dilation (rasterise_grad_egl.cu:153-194).

    Returns post-dilation (indices, barycentric, clip_w, dilated_mask) and,
    if `face_index` is given, additionally the post-dilation face index (the
    face-major Pallas gradient kernel keys its accumulation on it).
    """
    h, w = clip_w.shape

    # Dominant Scharr axis, sign dithered by pixel parity to reduce bias.
    l1_x = jnp.sum(jnp.abs(scharr_x), axis=-1)
    l1_y = jnp.sum(jnp.abs(scharr_y), axis=-1)
    horizontal = l1_x > l1_y                      # offset (1, 0) vs (0, 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    flip = (rows + cols) % 2 == 1                 # (x + y) parity dither
    # Encoded offset choice: 0:(+1,0) 1:(-1,0) 2:(0,+1) 3:(0,-1)
    primary = jnp.where(horizontal, jnp.where(flip, 1, 0),
                        jnp.where(flip, 3, 2))

    interior = ((rows > 0) & (rows < h - 1) & (cols > 0) & (cols < w - 1))

    # Neighbour views for the candidate offsets, (ox, oy) applied as
    # image(r - oy, c + ox); fills are the background clear values so border
    # reads can never dilate (interior mask also guards them).  Offsets
    # 4..7 are the DIAGONAL candidates of the opt-in improved dilation.
    offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]
    if DIAGONAL:
        offs += [(1, 1), (-1, -1), (1, -1), (-1, 1)]
    n_idx = jnp.stack([_shift(indices, ox, oy, -1) for ox, oy in offs])
    n_bary = jnp.stack([_shift(barycentric, ox, oy, -1.0) for ox, oy in offs])
    n_w = jnp.stack([_shift(clip_w, ox, oy, jnp.inf) for ox, oy in offs])
    n_face = (jnp.stack([_shift(face_index, ox, oy, -1) for ox, oy in offs])
              if face_index is not None else None)

    def attempt(choice, idx_cur, bary_cur, w_cur, face_cur, already):
        # Pure vector selects (TPU-friendly; a take_along_axis here would be
        # a 3.1M-row gather).
        def sel(stack):
            c = choice[..., None] if stack.ndim == 4 else choice
            out = stack[0]
            for k in range(1, len(offs)):
                out = jnp.where(c == k, stack[k], out)
            return out
        cand_idx = sel(n_idx)
        cand_bary = sel(n_bary)
        cand_w = sel(n_w)
        cand_face = sel(n_face) if n_face is not None else None
        # Neighbour is over a triangle, a *different* triangle, and nearer.
        # (Exact comparisons, matching the reference's zero-tolerance float
        # compares, rasterise_grad_egl.cu:87-89,165.)
        cond = (interior & ~already
                & (cand_idx[..., 0] != -1)
                & jnp.any(cand_idx != idx_cur, axis=-1)
                & (w_cur > cand_w))
        return (
            jnp.where(cond[..., None], cand_idx, idx_cur),
            jnp.where(cond[..., None], cand_bary, bary_cur),
            jnp.where(cond, cand_w, w_cur),
            (jnp.where(cond, cand_face, face_cur)
             if face_cur is not None else None),
            already | cond,
        )

    idx1, bary1, w1, face1, dilated = attempt(
        primary, indices, barycentric, clip_w, face_index,
        jnp.zeros_like(interior))
    secondary = primary ^ 1  # opposite direction
    idx2, bary2, w2, face2, dilated = attempt(
        secondary, idx1, bary1, w1, face1, dilated)
    if DIAGONAL:
        # Opt-in: four diagonal attempts in a parity-dithered order
        # (main diagonal pair first where flip is 0, anti-diagonal pair
        # first where flip is 1, each pair's sign also dithered), firing
        # only where no axial/earlier attempt adopted.
        d_first = jnp.where(flip, jnp.where(horizontal, 6, 7),
                            jnp.where(horizontal, 4, 5))
        for c in (d_first, d_first ^ 1, d_first ^ 2, d_first ^ 3):
            idx2, bary2, w2, face2, dilated = attempt(
                c, idx2, bary2, w2, face2, dilated)
    if face_index is None:
        return idx2, bary2, w2, dilated
    return idx2, bary2, w2, dilated, face2


class GradPrepass(NamedTuple):
    """Face-independent per-pixel planes shared by the Pallas gradient
    kernels (all [B, H, W] unless noted)."""
    grad_background: jnp.ndarray   # [B, H, W, C]
    covered_pre: jnp.ndarray       # bool, pre-dilation coverage
    face_pre: jnp.ndarray          # int32 pre-dilation face index
    bary_pre: jnp.ndarray          # [B, H, W, 3] pre-dilation (zeroed outside)
    face_d: jnp.ndarray            # int32 post-dilation face index
    bary_d: jnp.ndarray            # [B, H, W, 3] post-dilation
    ax: jnp.ndarray                # dl_dx * (W/2) / clip_w   (0 off-coverage)
    ay: jnp.ndarray                # dl_dy * (H/2) / clip_w
    px_t: jnp.ndarray              # dl_dx * (W/2) / clip_w^2
    py_t: jnp.ndarray              # dl_dy * (H/2) / clip_w^2
    dilated: jnp.ndarray           # bool dilation marker (debug)


def grad_prepass(pixels, grad_pixels, aux):
    """Elementwise XLA pre-pass shared by the Pallas gradient kernels:
    Scharr filtering, occluder dilation, and the viewport chain-rule factors
    that do not depend on the face (rasterise_grad_egl.cu:113-194,203-208).
    All arguments are batched [B, ...]."""
    batch, height, width, channels = pixels.shape
    scharr_x, scharr_y = jax.vmap(scharr_filters)(pixels)
    covered_pre = aux.indices[..., 0] >= 0
    grad_background = jnp.where(covered_pre[..., None], 0.0, grad_pixels)

    _, bary_d, clip_w_d, dilated, face_d = jax.vmap(_dilate)(
        aux.indices, aux.barycentric, aux.clip_w, scharr_x, scharr_y,
        aux.face_index)
    covered_d = face_d >= 0

    dl_dx = jnp.sum(grad_pixels * scharr_x, axis=-1)
    dl_dy = jnp.sum(grad_pixels * scharr_y, axis=-1)
    safe_w = jnp.where(covered_d, clip_w_d, 1.0)
    half_w, half_h = 0.5 * width, 0.5 * height
    zero = jnp.zeros_like(dl_dx)
    ax = jnp.where(covered_d, dl_dx * half_w / safe_w, zero)
    ay = jnp.where(covered_d, dl_dy * half_h / safe_w, zero)
    px_t = jnp.where(covered_d, dl_dx * half_w / (safe_w * safe_w), zero)
    py_t = jnp.where(covered_d, dl_dy * half_h / (safe_w * safe_w), zero)
    return GradPrepass(
        grad_background=grad_background,
        covered_pre=covered_pre,
        face_pre=aux.face_index,
        bary_pre=jnp.where(covered_pre[..., None], aux.barycentric, 0.0),
        face_d=face_d,
        bary_d=bary_d,
        ax=ax, ay=ay, px_t=px_t, py_t=py_t,
        dilated=dilated)


def rasterise_grad_single(vertices, faces, pixels, grad_pixels, aux,
                          parts="all", color_cotangent=None):
    """Gradient assembly for one image.

    Args:
        vertices: [V, 4] clip-space positions (same as the forward pass).
        faces: [F, 3] int32 (unused except for API parity; aux carries the
            per-pixel index triples already).
        pixels: [H, W, C] image to Scharr-filter.  For the direct path this is
            the forward output; the deferred path passes shaded pixels or the
            G-buffer here (dirt/rasterise_ops.py:204-237).
        grad_pixels: [H, W, C] upstream cotangent.
        aux: RasterAux from the forward pass on the same geometry.
        parts: "all", "position" (vertex grads only -- the deferred path's
            shaded-pixels call) or "color" (background + attribute grads
            only, skipping Scharr + dilation entirely since colour grads
            read pre-dilation coverage).  Skipped outputs return zeros;
            computed outputs are bitwise-equal to parts="all" (the two
            gradient groups are independent computations).
        color_cotangent: optional [H, W, C'] -- the fused-deferred form
            (parts="all" only): colour gradients and the background
            gradient read this cotangent (the shader-chained G-buffer
            cotangent) while position gradients keep Scharr-filtering
            `pixels` against `grad_pixels`, so one call computes both
            halves of the deferred backward.  Each half is the identical
            expression of the corresponding single-cotangent call.

    Returns:
        RasteriseGrads.
    """
    del faces
    vertices = jnp.asarray(vertices, jnp.float32)
    pixels = jnp.asarray(pixels, jnp.float32)
    grad_pixels = jnp.asarray(grad_pixels, jnp.float32)

    h, w, channels = pixels.shape
    num_vertices = vertices.shape[0]
    if color_cotangent is None:
        color_cot = grad_pixels
    else:
        assert parts == "all"
        color_cot = jnp.asarray(color_cotangent, jnp.float32)
    color_channels = color_cot.shape[-1]

    indices = aux.indices          # [H, W, 3]
    barycentric = aux.barycentric  # [H, W, 3]
    clip_w = aux.clip_w            # [H, W]
    covered = indices[..., 0] >= 0

    # -- Colour gradients (pre-dilation), rasterise_grad_egl.cu:134-148 --
    if parts in ("all", "color"):
        color_contrib = (color_cot[..., None, :]
                         * barycentric[..., :, None])     # [H, W, 3, C']
        color_contrib = jnp.where(covered[..., None, None], color_contrib,
                                  0.0)
        color_targets = jnp.where(covered[..., None], indices, 0)
        grad_vertex_colors = jax.ops.segment_sum(
            color_contrib.reshape(-1, color_channels),
            color_targets.reshape(-1),
            num_segments=num_vertices)
    else:
        grad_vertex_colors = jnp.zeros((num_vertices, color_channels),
                                       jnp.float32)

    grad_background = jnp.where(covered[..., None], 0.0, color_cot)

    if parts == "color":
        return RasteriseGrads(
            grad_background,
            jnp.zeros((num_vertices, 4), jnp.float32),
            grad_vertex_colors,
            debug_image(jnp.zeros((h, w), bool), grad_pixels))

    scharr_x, scharr_y = scharr_filters(pixels)

    # -- Occluder dilation, rasterise_grad_egl.cu:153-194 --
    indices_d, bary_d, clip_w_d, dilated = _dilate(
        indices, barycentric, clip_w, scharr_x, scharr_y)
    covered_d = indices_d[..., 0] >= 0

    # -- Position gradients (post-dilation), rasterise_grad_egl.cu:196-232 --
    dl_dx = jnp.sum(grad_pixels * scharr_x, axis=-1)  # [H, W]
    dl_dy = jnp.sum(grad_pixels * scharr_y, axis=-1)

    safe_idx = jnp.where(covered_d[..., None], indices_d, 0)
    corner_xy = jnp.take(vertices[:, :2], safe_idx, axis=0)  # [H, W, 3, 2]
    clip_x = jnp.sum(bary_d * corner_xy[..., 0], axis=-1)
    clip_y = jnp.sum(bary_d * corner_xy[..., 1], axis=-1)

    safe_w = jnp.where(covered_d, clip_w_d, 1.0)
    d_xview_by_xclip = (.5 * w) / safe_w
    d_yview_by_yclip = (.5 * h) / safe_w
    d_xview_by_wclip = -.5 * w * clip_x / (safe_w * safe_w)
    d_yview_by_wclip = -.5 * h * clip_y / (safe_w * safe_w)

    dl_dx_vert = dl_dx[..., None] * bary_d            # [H, W, 3]
    dl_dy_vert = dl_dy[..., None] * bary_d
    gx = dl_dx_vert * d_xview_by_xclip[..., None]
    gy = dl_dy_vert * d_yview_by_yclip[..., None]
    gw = (dl_dx_vert * d_xview_by_wclip[..., None]
          + dl_dy_vert * d_yview_by_wclip[..., None])
    pos_contrib = jnp.stack(
        [gx, gy, jnp.zeros_like(gx), gw], axis=-1)    # [H, W, 3, 4]
    pos_contrib = jnp.where(covered_d[..., None, None], pos_contrib, 0.0)
    grad_vertices = jax.ops.segment_sum(
        pos_contrib.reshape(-1, 4),
        safe_idx.reshape(-1),
        num_segments=num_vertices)

    debug = debug_image(dilated, grad_pixels)
    return RasteriseGrads(grad_background, grad_vertices, grad_vertex_colors,
                          debug)


def rasterise_grad_batch(vertices, faces, pixels, grad_pixels, aux,
                         implementation=None, parts="all",
                         color_cotangent=None):
    """Batched gradient assembly ([B, ...] on every argument).

    `parts` ("all" / "position" / "color") selects which gradient rows are
    computed (see rasterise_grad_single); the deferred path's two calls
    each request only the half they consume, skipping ~half the per-visit
    reductions (and, for "color", the whole Scharr + dilation pre-pass).
    Computed rows are bitwise-equal to the matching parts="all" outputs;
    skipped outputs are zeros.

    `color_cotangent` ([B, H, W, C'], parts="all" only) is the
    fused-deferred form (see rasterise_grad_single): colour/background
    gradients read it, position gradients read pixels/grad_pixels -- one
    kernel sweep computes both halves of the deferred backward.  Not
    supported by the reference-only "mxu" kernel
    (rasterise_grad_deferred falls back to two calls there).

    `implementation`: "dense" (chunk-dense VPU-reduction kernel,
    ops/grad_dense.py), "blocks" (block-binned dense kernel for large
    meshes, ops/grad_blocks.py), "mxu" (mask-matrix contraction kernel,
    ops/grad_mxu.py), "xla" (segment_sum scatters, this module), "pallas"
    (alias for the size-based automatic Pallas-kernel choice production
    deploys on device -- see _auto_grad_kernel), or None for automatic
    (same choice on accelerators, "xla" on CPU; overridable with
    DIRT_TPU_GRAD_BACKEND).  Unknown names raise ValueError rather than
    silently falling through.  (A sixth path -- the round-1 face-major
    scalar-SMEM kernel -- was deleted in round 3: Mosaic miscompiled it on
    real TPUs; the minimised compiler-bug repro is
    repro/mosaic_scalar_smem_accum.py.)
    """
    from . import dispatch
    # Coerce before guarding so list/numpy inputs take the same path as
    # arrays; constants folded through the compile relay arrive corrupted
    # (see dispatch.guard_constants).
    (vertices, faces, pixels, grad_pixels, aux,
     color_cotangent) = dispatch.guard_constants(
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(pixels, jnp.float32),
        jnp.asarray(grad_pixels, jnp.float32), aux,
        None if color_cotangent is None
        else jnp.asarray(color_cotangent, jnp.float32))
    if color_cotangent is not None and parts != "all":
        raise ValueError(
            "color_cotangent requires parts='all' (it IS the fused "
            "position+color form)")
    implementation = _resolve_implementation(
        implementation, faces.shape[1], pixels.shape[1:3])
    if implementation not in ("dense", "mxu", "blocks", "xla"):
        raise ValueError(
            f"unknown gradient implementation {implementation!r}; expected "
            "'dense', 'mxu', 'blocks', 'xla', 'pallas' or None/'auto'")
    if parts not in ("all", "position", "color"):
        raise ValueError(
            f"unknown parts {parts!r}; expected 'all', 'position' or 'color'")
    if implementation == "dense":
        from . import grad_dense
        return grad_dense.rasterise_grad_batch(
            vertices, faces, pixels, grad_pixels, aux, parts=parts,
            color_cotangent=color_cotangent)
    if implementation == "mxu":
        from . import grad_mxu
        if color_cotangent is not None:
            raise ValueError(
                "the reference-only 'mxu' kernel does not support "
                "color_cotangent; rasterise_grad_deferred falls back to "
                "two calls for it")
        grads = grad_mxu.rasterise_grad_batch(
            vertices, faces, pixels, grad_pixels, aux)
        if parts == "position":     # reference-only kernel: compute-and-mask
            grads = grads._replace(
                grad_vertex_colors=jnp.zeros_like(grads.grad_vertex_colors))
        elif parts == "color":
            grads = grads._replace(
                grad_vertices=jnp.zeros_like(grads.grad_vertices))
        return grads
    if implementation == "blocks":
        from . import grad_blocks
        return grad_blocks.rasterise_grad_batch(
            vertices, faces, pixels, grad_pixels, aux, parts=parts,
            color_cotangent=color_cotangent)
    if color_cotangent is None:
        return jax.vmap(functools.partial(
            rasterise_grad_single, parts=parts))(
            vertices, faces, pixels, grad_pixels, aux)
    return jax.vmap(lambda v, f, p, gp, a, cc: rasterise_grad_single(
        v, f, p, gp, a, parts=parts, color_cotangent=cc))(
        vertices, faces, pixels, grad_pixels, aux, color_cotangent)


def _resolve_implementation(implementation, num_faces, image_hw):
    """None/env/"auto"/"pallas" -> a concrete kernel name.  "pallas" is
    the production Pallas choice regardless of platform (the debug surface
    must show what the deployed kernel does; rasterise_ops.
    rasterise_grad_debug documents this name)."""
    import os
    from . import dispatch
    if implementation is None:
        implementation = os.environ.get("DIRT_TPU_GRAD_BACKEND", "auto")
    if implementation == "auto":
        implementation = (_auto_grad_kernel(num_faces, image_hw)
                          if dispatch.on_accelerator() else "xla")
    if implementation == "pallas":
        implementation = _auto_grad_kernel(num_faces, image_hw)
    return implementation


def _auto_grad_kernel(num_faces, image_hw):
    """Static kernel choice for the TPU gradient assembly.

    The block-binned face-major kernel (ops/grad_blocks.py) is the
    production choice at EVERY mesh size (round-3 v5e measurement at the
    16x256^2x512f bench config: 2.6 ms vs 7.9 ms chunk-dense, parity
    3e-7): same reduction math, but its O(faces) output rows feed a
    segment_sum 16x smaller than the chunk-dense kernel's per-tile
    partial-sum layout (num_tiles x num_chunks x CHUNK rows), and its CSR
    slot list runs one grid step per actual (block, tile) overlap.  The
    chunk-dense kernel ("dense") and the MXU contraction kernel ("mxu",
    single-pass bf16-split masked matmuls) stay available via
    DIRT_TPU_GRAD_BACKEND for comparison; the round-1 face-major scalar
    kernel was deleted (Mosaic miscompiled it --
    repro/mosaic_scalar_smem_accum.py).
    """
    del num_faces, image_hw
    return "blocks"


def _channel_groups(channels):
    """The reference's 3+1 channel grouping (dirt/rasterise_ops.py:86-108)
    as (begin, end) slices; [(0, channels)] for the native 1/3 cases."""
    if channels in (1, 3):
        return [(0, channels)]
    groups = []
    begin = 0
    while begin < channels:
        end = begin + 3 if begin + 3 <= channels else begin + 1
        groups.append((begin, end))
        begin = end
    return groups


def rasterise_grad_deferred(vertices, faces, pixels, grad_pixels, gbuffer,
                            grad_gbuffer, aux, implementation=None):
    """Fused deferred backward: both halves of the deferred gradient in
    max(shaded groups, G-buffer groups) kernel sweeps instead of their sum.

    The deferred backward needs (a) vertex gradients from Scharr-filtering
    the *shaded* pixels against the loss cotangent and (b) attribute /
    background gradients from the shader-chained G-buffer cotangent
    (dirt/rasterise_ops.py:204-237).  The two-call formulation
    (parts="position" + parts="color") sweeps the visit schedule twice;
    but the position planes are channel-independent and the colour
    reductions only read the cotangent planes, so ONE parts="all"-shaped
    sweep whose cotangent planes come from `grad_gbuffer`
    (`color_cotangent` in rasterise_grad_batch) computes both -- sharing
    the face-table pack, the kernel launch, the per-visit face-id reads
    and one output scatter.

    Channel handling: the reference's 3+1 grouping only changes GRADIENT
    VALUES through the per-group Scharr/dilation of the position half --
    colour reductions are per-channel independent, so grouping the
    G-buffer cotangent never changes a colour row.  Hence ALL G-buffer
    channels ride the FIRST shaded group's sweep (one call in the common
    C_shaded<=3 case, however wide the G-buffer), and any remaining
    shaded groups add position-only sweeps.  Every computed row is the
    identical expression subtree of the grouped two-call path, so the
    result is BITWISE-equal to it (pinned in tests/test_deferred_fused.py).

    Returns (grad_background, grad_vertices, grad_attributes).
    """
    implementation = _resolve_implementation(
        implementation, faces.shape[1], pixels.shape[1:3])
    if implementation == "mxu":
        # Reference-only kernel without a fused form: two-call fallback.
        _, grad_vertices, _ = rasterise_grad_grouped(
            vertices, faces, pixels, grad_pixels, aux, parts="position")
        grad_background, _, grad_attrs = rasterise_grad_grouped(
            vertices, faces, gbuffer, grad_gbuffer, aux, parts="color")
        return grad_background, grad_vertices, grad_attrs
    del gbuffer  # only the mxu fallback's colour call reads the G-buffer

    s_groups = _channel_groups(pixels.shape[-1])
    grad_vertices = None
    grad_background = None
    grad_attrs = None
    for i, (b0, b1) in enumerate(s_groups):
        if i == 0:
            g = rasterise_grad_batch(
                vertices, faces, pixels[..., b0:b1],
                grad_pixels[..., b0:b1], aux,
                implementation=implementation, parts="all",
                color_cotangent=grad_gbuffer)
            grad_background = g.grad_background
            grad_attrs = g.grad_vertex_colors
        else:
            g = rasterise_grad_batch(
                vertices, faces, pixels[..., b0:b1],
                grad_pixels[..., b0:b1], aux,
                implementation=implementation, parts="position")
        grad_vertices = (g.grad_vertices if grad_vertices is None
                         else grad_vertices + g.grad_vertices)
    return grad_background, grad_vertices, grad_attrs


def rasterise_grad_grouped(vertices, faces, pixels, grad_pixels, aux,
                           parts="all", implementation=None):
    """Channel-grouped gradient assembly, matching reference semantics.

    The reference native op only handles 1 or 3 channels; wider images are
    split into groups of 3 (with a trailing group of 1) and the per-group
    vertex gradients summed (dirt/rasterise_ops.py:145-163).  Because the
    Scharr responses and the dilation decisions are computed per *group*,
    grouping changes the gradient values; we replicate the grouping exactly
    for parity.  All arguments are batched [B, ...].

    `parts` and `implementation` propagate to every per-group call (see
    rasterise_grad_batch).  Grouping constrains only the POSITION half
    (the Scharr responses and dilation decisions are per-group, so the
    per-group vertex gradients must be computed separately and summed);
    colour and background rows are per-channel independent, so they ride
    ONE sweep however wide the image is (round 5; the same observation
    that fully fused the deferred backward -- the grouped-loop values are
    bitwise-identical, each channel's rows being the same expression
    subtree in a wider call).  "all" therefore runs 1 full call (group
    0's Scharr + every colour channel via `color_cotangent`) plus
    position-only calls for the remaining groups; "color" runs exactly
    one call.

    Returns (grad_background, grad_vertices, grad_vertex_colors).
    """
    channels = pixels.shape[-1]
    if channels in (1, 3):
        grads = rasterise_grad_batch(vertices, faces, pixels, grad_pixels,
                                     aux, parts=parts,
                                     implementation=implementation)
        return grads.grad_background, grads.grad_vertices, grads.grad_vertex_colors

    if parts == "color":
        # Colour rows never depend on the grouping: one call, all channels.
        grads = rasterise_grad_batch(
            vertices, faces, pixels, grad_pixels, aux,
            parts="color", implementation=implementation)
        return (grads.grad_background, grads.grad_vertices,
                grads.grad_vertex_colors)

    grad_background = None
    grad_vertex_colors = None
    grad_vertices = None
    position_backgrounds = []
    for begin, end in _channel_groups(channels):
        if parts == "all" and grad_vertices is None:
            # First group: its Scharr drives this call's position rows,
            # and EVERY colour channel rides along as the colour cotangent.
            grads = rasterise_grad_batch(
                vertices, faces,
                pixels[..., begin:end], grad_pixels[..., begin:end], aux,
                parts="all", implementation=implementation,
                color_cotangent=grad_pixels)
            grad_background = grads.grad_background
            grad_vertex_colors = grads.grad_vertex_colors
        else:
            grads = rasterise_grad_batch(
                vertices, faces,
                pixels[..., begin:end], grad_pixels[..., begin:end], aux,
                parts="position", implementation=implementation)
            position_backgrounds.append(grads.grad_background)
        grad_vertices = (grads.grad_vertices if grad_vertices is None
                         else grad_vertices + grads.grad_vertices)
    if parts == "position":
        # Pre-round-5 contract: real (uncovered-cotangent) background,
        # zero colour rows.
        grad_background = jnp.concatenate(position_backgrounds, axis=-1)
        grad_vertex_colors = jnp.zeros(
            grad_vertices.shape[:-1] + (channels,), jnp.float32)
    return grad_background, grad_vertices, grad_vertex_colors
