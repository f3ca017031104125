"""Dense Pallas TPU kernel for the gradient scatters.

Same gradient semantics as ops/backward.py (the reference's
assemble_grads kernel, csrc/rasterise_grad_egl.cu:93-236), with
the per-face masked pixel reductions computed DENSELY over a whole face
chunk at once, mirroring ops/forward_dense.py's treatment of the forward
sweep:

    mask_d  [CHUNK, PIX] = (face_d == fid)          winner mask per face
    wd_k    [CHUNK, PIX] = mask_d ? bary_d_k : 0
    sums    [CHUNK, 1]   = reduce over the pixel axis

so every accumulation is a full-width VPU reduction of a [CHUNK, PIX]
plane; there is no per-face `fori_loop`, no scalar SMEM accumulation (the
serialisation that bounded the round-1 face-major scalar kernel at ~13.7 ms
on the bench scene -- a kernel since deleted: Mosaic miscompiled it on real
TPUs, see repro/mosaic_scalar_smem_accum.py), and no MXU precision
contortions (ops/grad_mxu.py's Precision.HIGHEST 6-pass matmuls measured
slower still).

The face-dependent viewport term is built by broadcasting face corner
columns against pixel rows, exactly like the dense forward kernel:

    cx [CHUNK, PIX] = bd0 * x0[f] + bd1 * x1[f] + bd2 * x2[f]
    p  [CHUNK, PIX] = Px * cx + Py * cy
    gw_k           = -sum_pix (mask_d ? bd_k : 0) * p

The pixel-plane block is indexed per tile only, so Pallas fetches it once
per (batch, tile) and the chunk sweep re-uses it from VMEM; only the tiny
[CHUNK, DF] face table streams per chunk.

Padded face slots (fid -1) and padded pixels (all-zero planes) contribute
exact zeros: every reduced product carries an `ax/ay/Px/Py/bary_pre`
factor that the XLA pre-pass zeroes outside coverage, so visiting the full
chunk is correct, only wasteful (same argument as forward_dense).
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import backward, forward_pallas, grad_tables

TILE_H = int(_os.environ.get("DIRT_TPU_GRAD_DENSE_TILE_H", 32))
TILE_W = int(_os.environ.get("DIRT_TPU_GRAD_DENSE_TILE_W", 128))
CHUNK = int(_os.environ.get("DIRT_TPU_GRAD_DENSE_CHUNK", 64))
FUSED = _os.environ.get("DIRT_TPU_GRAD_DENSE_FUSED", "1") != "0"
# Reduction slab height (0 = full-chunk); see chunk_sums.
SLAB = int(_os.environ.get("DIRT_TPU_GRAD_SLAB", "0"))
# (REMOVED, round 5: DIRT_TPU_GRAD_FOLD -- per-pixel weight products
# (bary_d_k*ax, bary_d_k*ay, bary_pre_k*grad_c) hoisted to [1, PIX] rows
# before the winner-mask select, the three gw_k corners sharing one
# masked-p plane: 5 fewer [CHUNK, PIX] elementwise ops of ~39 per visit by
# count, value-identical.  The device A/B LOST 2-3% at every size: the
# select's [1, PIX] -> [CHUNK, PIX] broadcast costs more than the plane
# mul it saved (sweeps/_sweep_fold.py, BASELINE.md round-5 section).)


def _cdiv(a, b):
    return -(-a // b)


def plane_layout(parts, channels):
    """Plane-stack layout for a `parts` selection (see chunk_sums).

    Returns (n_planes, names) where names maps logical plane name ->
    index.  The position-only and color-only stacks carry ONLY the planes
    their reductions read, shrinking both the HBM stack and the per-visit
    plane-tile DMA:
        all:      ax ay Px Py bary_d0-2 face_d bary_pre0-2 face_pre grad..
        position: ax ay Px Py bary_d0-2 face_d                (8 planes)
        color:    bary_pre0-2 face_pre grad..                 (4+C planes)
    """
    if parts == "position":
        return 8, dict(ax=0, ay=1, px=2, py=3, bary_d=4, face_d=7)
    if parts == "color":
        return 4 + channels, dict(bary_pre=0, face_pre=3, grad=4)
    return 12 + channels, dict(ax=0, ay=1, px=2, py=3, bary_d=4, face_d=7,
                               bary_pre=8, face_pre=11, grad=12)


def d_out_for(parts, channels):
    """Per-corner output width: 3 position rows (gx, gy, gw) and/or
    `channels` colour rows, laid out [CHUNK, 3, d_corner]."""
    if parts == "position":
        return 9
    if parts == "color":
        return 3 * channels
    return 9 + 3 * channels


def chunk_sums(col, plane, channels, parts="all"):
    """Masked per-face pixel reductions for one chunk: [K, d_out].

    `col(i)` returns gradient-face-table column i as [K, 1]
    (ops/grad_tables.py layout); `plane(i)` returns per-pixel plane i as
    [1, PIX] or [K', PIX] broadcastable rows, laid out per
    `plane_layout(parts, channels)`.  Shared by the chunk-grid, fused and
    block-binned gradient kernels so the reduction arithmetic cannot
    drift between them.

    `parts` selects which reduction rows to compute: "all" (direct path),
    "position" (gx/gy/gw only -- the deferred path's shaded-pixels call
    discards colour grads) or "color" (colour rows only -- the deferred
    G-buffer-cotangent call discards vertex grads).  Each selection is
    the identical expression subtree of the full form (reductions are
    independent), so the computed rows are BITWISE-equal to the
    corresponding slices of parts="all".

    With DIRT_TPU_GRAD_SLAB=S (S >= 1 dividing the chunk), the chunk's
    face rows are processed in S-row slabs and the [S, d_out] results
    concatenated.  BITWISE-identical by construction: every face row's
    reduction is independent of the other rows, so slicing the row axis
    changes nothing but the order the rows are materialised in.  The
    point is register pressure: the full-chunk form keeps ~6 live
    [CHUNK, PIX] planes (~768 vregs at 128x1024), far over the register
    file, so Mosaic spills intermediates to VMEM; S=8 slabs keep the
    live set at [8, PIX].
    """
    k = col(0).shape[0]
    s = SLAB
    if s >= 1 and k > s and k % s == 0:
        outs = []
        for s0 in range(0, k, s):
            def scol(i, s0=s0):
                return col(i)[s0:s0 + s]
            outs.append(_chunk_sums(scol, plane, channels, parts))
        return jnp.concatenate(outs, axis=0)
    return _chunk_sums(col, plane, channels, parts)


def _chunk_sums(col, plane, channels, parts="all"):
    _, L = plane_layout(parts, channels)
    fid = col(4)                                       # original index
    want_pos = parts in ("all", "position")
    want_col = parts in ("all", "color")
    if want_pos:
        mask_d = plane(L["face_d"]) == fid             # [CHUNK, PIX]
        # Face-dependent fragment clip x, y and the viewport w-term.
        bd = L["bary_d"]
        cx = ((plane(bd) * col(6) + plane(bd + 1) * col(7))
              + plane(bd + 2) * col(8))
        cy = ((plane(bd) * col(9) + plane(bd + 1) * col(10))
              + plane(bd + 2) * col(11))
        p = plane(L["px"]) * cx + plane(L["py"]) * cy
    if want_col:
        mask_pre = plane(L["face_pre"]) == fid

    def rsum(a):                                       # [CHUNK, 1]
        return jnp.sum(a, axis=1, keepdims=True)

    sums = []
    for k in range(3):
        if want_pos:
            wd = jnp.where(mask_d, plane(L["bary_d"] + k), 0.0)
            sums.append(rsum(wd * plane(L["ax"])))     # gx_k
            sums.append(rsum(wd * plane(L["ay"])))     # gy_k
            sums.append(-rsum(wd * p))                 # gw_k
        if want_col:
            wp = jnp.where(mask_pre, plane(L["bary_pre"] + k), 0.0)
            for c in range(channels):
                sums.append(rsum(wp * plane(L["grad"] + c)))  # gcolor_kc
    return jnp.concatenate(sums, axis=1)               # [CHUNK, d_out]


def _grad_kernel(count_ref, face_ref, planes_ref, out_ref, *, channels,
                 parts):
    # grid: (batch, tile, chunk); every (tile, chunk) owns its own output
    # block, so all three grid dimensions are parallel.
    chunk_idx = pl.program_id(2)
    d_out = d_out_for(parts, channels)
    chunk_active = chunk_idx * CHUNK < count_ref[0, 0, 0, 0, 0]

    @pl.when(jnp.logical_not(chunk_active))
    def _skip():
        out_ref[0, 0, 0] = jnp.zeros((CHUNK, d_out), jnp.float32)

    @pl.when(chunk_active)
    def _process():
        def plane(i):
            return planes_ref[0, 0, i:i + 1, :]            # [1, PIX]

        def col(i):
            return face_ref[0, 0, 0, :, i:i + 1]           # [CHUNK, 1]

        out_ref[0, 0, 0] = chunk_sums(col, plane, channels, parts)


def _grad_kernel_fused(count_ref, face_ref, planes_ref, out_ref, *,
                       channels, num_chunks, parts):
    """Fused schedule: grid (batch, tiles); in-kernel loop over chunks with
    the tile's whole gradient face table resident in VMEM (the round-3
    device sweep measured ~2 us fixed cost per grid step; see
    forward_dense)."""
    d_out = d_out_for(parts, channels)

    def plane(i):
        return planes_ref[0, 0, i:i + 1, :]                # [1, PIX]

    count = count_ref[0, 0, 0, 0, 0]
    n_live = (count + (CHUNK - 1)) // CHUNK

    def live_body(c, _):
        def col(i):
            return face_ref[0, 0, c, :, i:i + 1]           # [CHUNK, 1]
        out_ref[0, 0, c] = chunk_sums(col, plane, channels, parts)
        return 0

    def dead_body(c, _):
        out_ref[0, 0, c] = jnp.zeros((CHUNK, d_out), jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_live, live_body, 0)
    jax.lax.fori_loop(n_live, num_chunks, dead_body, 0)


def prepass_and_planes(pixels, grad_pixels, aux, parts, color_cotangent=None):
    """Runs the XLA pre-pass appropriate for `parts` and assembles the
    [B, NP, H, W] plane stack per plane_layout.  Returns (planes,
    grad_background, dilated).

    parts="color" skips the Scharr + dilation pre-pass entirely: colour
    gradients read PRE-dilation coverage (aux.face_index / barycentric
    directly, reference rasterise_grad_egl.cu:134-148), so the only
    pre-pass products needed are the background cotangent mask and the
    zeroed barycentrics.  Its `dilated` debug marker is all-false (no
    dilation was computed); the deferred path discards the debug image.

    `color_cotangent` (requires parts="all") builds the FUSED-DEFERRED
    stack: the position planes (ax/ay/px/py/bary_d/face_d) come from
    Scharr-filtering `pixels` (the shaded image) against `grad_pixels`,
    while the cotangent planes feeding the colour reductions -- and the
    background gradient -- come from `color_cotangent` (the shader-chained
    G-buffer cotangent).  This makes one parts="all"-shaped kernel call
    compute both halves of the deferred backward
    (dirt/rasterise_ops.py:204-237) in a single sweep over the visits;
    each half is the identical expression subtree of the corresponding
    single-part call, so computed rows stay bitwise-equal.
    """
    f32 = lambda a: a.astype(jnp.float32)
    if color_cotangent is not None:
        assert parts == "all"
        pre = backward.grad_prepass(pixels, grad_pixels, aux)
        covered_pre = aux.indices[..., 0] >= 0
        grad_background = jnp.where(covered_pre[..., None], 0.0,
                                    color_cotangent)
        planes = jnp.concatenate([
            jnp.stack([pre.ax, pre.ay, pre.px_t, pre.py_t], axis=1),
            jnp.moveaxis(pre.bary_d, -1, 1),
            f32(pre.face_d)[:, None],
            jnp.moveaxis(pre.bary_pre, -1, 1),
            f32(pre.face_pre)[:, None],
            jnp.moveaxis(color_cotangent, -1, 1),
        ], axis=1)                                    # [B, 12+Ccol, H, W]
        return planes, grad_background, pre.dilated
    if parts == "color":
        covered_pre = aux.indices[..., 0] >= 0
        grad_background = jnp.where(covered_pre[..., None], 0.0, grad_pixels)
        bary_pre = jnp.where(covered_pre[..., None], aux.barycentric, 0.0)
        planes = jnp.concatenate([
            jnp.moveaxis(bary_pre, -1, 1),
            f32(aux.face_index)[:, None],
            jnp.moveaxis(grad_pixels, -1, 1),
        ], axis=1)
        dilated = jnp.zeros(grad_pixels.shape[:3], bool)
        return planes, grad_background, dilated
    pre = backward.grad_prepass(pixels, grad_pixels, aux)
    if parts == "position":
        planes = jnp.concatenate([
            jnp.stack([pre.ax, pre.ay, pre.px_t, pre.py_t], axis=1),
            jnp.moveaxis(pre.bary_d, -1, 1),
            f32(pre.face_d)[:, None],
        ], axis=1)
    else:
        planes = jnp.concatenate([
            jnp.stack([pre.ax, pre.ay, pre.px_t, pre.py_t], axis=1),
            jnp.moveaxis(pre.bary_d, -1, 1),
            f32(pre.face_d)[:, None],
            jnp.moveaxis(pre.bary_pre, -1, 1),
            f32(pre.face_pre)[:, None],
            jnp.moveaxis(grad_pixels, -1, 1),
        ], axis=1)                                    # [B, NP, H, W]
    return planes, pre.grad_background, pre.dilated


def scatter_face_grads(face_grads, seg, batch, num_vertices, channels,
                       parts):
    """Segment-sums [*, 3, d_corner] per-corner rows into per-vertex
    (grad_vertices, grad_vertex_colors), zero-filling the parts not
    computed."""
    d_corner = d_out_for(parts, channels) // 3
    rows = face_grads.reshape(-1, d_corner)
    summed = jax.ops.segment_sum(rows, seg,
                                 num_segments=batch * num_vertices)
    summed = summed.reshape(batch, num_vertices, d_corner)
    zeros = jnp.zeros((batch, num_vertices), jnp.float32)
    if parts == "position":
        grad_vertices = jnp.stack(
            [summed[..., 0], summed[..., 1], zeros, summed[..., 2]], axis=-1)
        grad_vertex_colors = jnp.zeros(
            (batch, num_vertices, channels), jnp.float32)
    elif parts == "color":
        grad_vertices = jnp.zeros((batch, num_vertices, 4), jnp.float32)
        grad_vertex_colors = summed
    else:
        grad_vertices = jnp.stack(
            [summed[..., 0], summed[..., 1], zeros, summed[..., 2]], axis=-1)
        grad_vertex_colors = summed[..., 3:]
    return grad_vertices, grad_vertex_colors


def rasterise_grad_batch(vertices, faces, pixels, grad_pixels, aux,
                         interpret=None, parts="all", color_cotangent=None):
    """Dense Pallas gradient assembly; same contract and semantics as
    backward.rasterise_grad_batch (all arguments [B, ...]).

    `color_cotangent` selects the fused-deferred plane stack (see
    prepass_and_planes): colour reductions and the background gradient
    read it instead of `grad_pixels`, and the output colour width is its
    channel count (which may differ from the shaded image's)."""
    if interpret is None:
        from . import dispatch
        interpret = not dispatch.on_accelerator()

    from . import dispatch as _dispatch
    (vertices, faces, pixels, grad_pixels, aux,
     color_cotangent) = _dispatch.guard_constants(
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(pixels, jnp.float32),
        jnp.asarray(grad_pixels, jnp.float32), aux,
        None if color_cotangent is None
        else jnp.asarray(color_cotangent, jnp.float32))

    batch, height, width, _ = pixels.shape
    # The colour-row width follows the cotangent feeding the colour
    # reductions; the shaded image's channel count only shapes the Scharr
    # pre-pass (whose outputs are channel-count independent).
    channels = (pixels.shape[-1] if color_cotangent is None
                else color_cotangent.shape[-1])
    num_vertices = vertices.shape[1]
    num_faces = faces.shape[1]

    if num_faces == 0:
        cot = grad_pixels if color_cotangent is None else color_cotangent
        return backward.RasteriseGrads(
            grad_background=cot,
            grad_vertices=jnp.zeros((batch, num_vertices, 4), jnp.float32),
            grad_vertex_colors=jnp.zeros(
                (batch, num_vertices, channels), jnp.float32),
            debug=backward.debug_image(
                jnp.zeros((batch, height, width), bool), grad_pixels))

    # --- elementwise XLA pre-pass + parts-specific plane stack ---
    planes, grad_background, dilated = prepass_and_planes(
        pixels, grad_pixels, aux, parts, color_cotangent)

    num_chunks = max(1, _cdiv(
        forward_pallas.tile_face_cap(num_faces), CHUNK))
    tiles_y = _cdiv(height, TILE_H)
    tiles_x = _cdiv(width, TILE_W)
    num_tiles = tiles_y * tiles_x
    hp, wp = tiles_y * TILE_H, tiles_x * TILE_W
    pix = TILE_H * TILE_W
    n_planes = plane_layout(parts, channels)[0]
    d_out = d_out_for(parts, channels)
    # Tile to [B, T, NP, PIX] (one transposing copy; padded pixels keep
    # face ids intact but all value planes zero, so they contribute zeros).
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - height),
                              (0, wp - width)))
    planes = planes.reshape(batch, n_planes, tiles_y, TILE_H, tiles_x, TILE_W)
    planes = planes.transpose(0, 2, 4, 1, 3, 5).reshape(
        batch, num_tiles, n_planes, pix)

    # Reuse the gradient packer (dilation-widened bboxes, hits-first order);
    # the dense kernel reads columns 4 (orig index) and 6-11 (corner x, y).
    face_data, counts, sorted_orig = jax.vmap(
        functools.partial(grad_tables._pack_grad_faces, height=height,
                          width=width, num_chunks=num_chunks, tiles_y=tiles_y,
                          tiles_x=tiles_x, chunk=CHUNK, tile_h=TILE_H,
                          tile_w=TILE_W))(vertices, faces)

    if FUSED:
        kernel = functools.partial(_grad_kernel_fused, channels=channels,
                                   num_chunks=num_chunks, parts=parts)
        face_grads = pl.pallas_call(
            kernel,
            grid=(batch, num_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1, 1),
                             lambda b, t: (b, t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, num_chunks, CHUNK, grad_tables._DF),
                             lambda b, t: (b, t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n_planes, pix),
                             lambda b, t: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, num_chunks, CHUNK, d_out),
                                   lambda b, t: (b, t, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, num_tiles, num_chunks, CHUNK, d_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(counts, face_data, planes)
    else:
        kernel = functools.partial(_grad_kernel, channels=channels,
                                   parts=parts)
        face_grads = pl.pallas_call(
            kernel,
            grid=(batch, num_tiles, num_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1, 1),
                             lambda b, t, c: (b, t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, CHUNK, grad_tables._DF),
                             lambda b, t, c: (b, t, c, 0, 0),
                             memory_space=pltpu.VMEM),
                # Indexed per tile only: the chunk sweep (innermost grid
                # dim) re-uses the block without a fresh DMA.
                pl.BlockSpec((1, 1, n_planes, pix),
                             lambda b, t, c: (b, t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, CHUNK, d_out),
                                   lambda b, t, c: (b, t, c, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, num_tiles, num_chunks, CHUNK, d_out), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            interpret=interpret,
        )(counts, face_data, planes)

    # --- tiny face-corner -> vertex scatter (face-count sized) ---
    face_grads = face_grads.reshape(
        batch, num_tiles * num_chunks * CHUNK, 3, d_out // 3)
    corner_vids = jnp.take_along_axis(
        faces, sorted_orig.reshape(batch, -1)[..., None], axis=1)
    batch_offsets = (jnp.arange(batch, dtype=jnp.int32)
                     * num_vertices)[:, None, None]
    seg = (corner_vids + batch_offsets).reshape(-1)
    grad_vertices, grad_vertex_colors = scatter_face_grads(
        face_grads, seg, batch, num_vertices, channels, parts)
    debug = backward.debug_image(dilated, grad_pixels)
    return backward.RasteriseGrads(
        grad_background, grad_vertices, grad_vertex_colors, debug)
