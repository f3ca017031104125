"""Face-major Pallas TPU kernel for the gradient scatters.

The analytic backward pass (ops/backward.py) ends in two large scatter-adds:
per-pixel, bary-weighted contributions into grad_vertices / grad_vertex_colors
(the reference uses atomicAdd, rasterise_grad_egl.cu:140,228-230; the XLA
formulation uses segment_sum, which lowers to scatter and costs ~20 ms per
3.1M rows on TPU v5e).  This kernel inverts the loop: the Scharr responses
and occluder dilation stay as cheap elementwise XLA, but the scatters become
face-major masked *reductions* -- for each (face chunk, image tile) the kernel
sums each face's pixel contributions over the tile with a winner-mask, so all
accumulation is dense VPU work and the only remaining scatter is a tiny
face-count-sized segment_sum from face corners to vertices.

Gradient semantics are identical to ops/backward.py (same pre-dilation colour
weights, post-dilation position weights, viewport chain rule); tests compare
the two paths directly.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import backward, forward_pallas, geometry

import os as _os

TILE_H = forward_pallas.TILE_H
TILE_W = forward_pallas.TILE_W
# The gradient kernel's SMEM accumulator block scales with its chunk size and
# tops out below the forward kernel's sweet spot.  (An MXU masked-sum variant
# measured SLOWER at this face density -- see CLAUDE.md.)
CHUNK = int(_os.environ.get("DIRT_TPU_GRAD_CHUNK", 128))
_BIG = forward_pallas._BIG
_DF = 12   # face-table floats: bbox(4), orig idx, valid, corner x0 y0 x1 y1 x2 y2


def _cdiv(a, b):
    return -(-a // b)


def _grad_face_table(vertices, faces, height, width, pad_rows):
    """Per-face table for the gradient kernels: [F + pad_rows, _DF] float32
    with the dilation-widened pixel bbox in columns 0-3 (padded rows get an
    empty bbox so no binning scheme selects them)."""
    num_faces = faces.shape[0]
    setup = geometry.face_setup(vertices, faces)

    corners = jnp.take(vertices, faces, axis=0)          # [F, 3, 4]
    w = corners[..., 3]
    safe_w = jnp.where(w > 0, w, 1.0)
    px = (corners[..., 0] / safe_w + 1.0) * (width / 2.0)
    py = (1.0 - corners[..., 1] / safe_w) * (height / 2.0)

    unbounded = jnp.any(w <= 0, axis=-1)
    col0 = jnp.floor(jnp.min(px, axis=-1) - 0.5).astype(jnp.int32) - 1
    col1 = jnp.ceil(jnp.max(px, axis=-1) - 0.5).astype(jnp.int32) + 1
    row0 = jnp.floor(jnp.min(py, axis=-1) - 0.5).astype(jnp.int32) - 1
    row1 = jnp.ceil(jnp.max(py, axis=-1) - 0.5).astype(jnp.int32) + 1
    # Dilation can move a face's gradient support one pixel beyond its
    # rasterised footprint: widen the bbox by an extra pixel.
    col0 = jnp.where(unbounded, 0, jnp.clip(col0 - 1, 0, width - 1))
    col1 = jnp.where(unbounded, width - 1, jnp.clip(col1 + 1, 0, width - 1))
    row0 = jnp.where(unbounded, 0, jnp.clip(row0 - 1, 0, height - 1))
    row1 = jnp.where(unbounded, height - 1, jnp.clip(row1 + 1, 0, height - 1))

    valid = setup.valid
    row0 = jnp.where(valid, row0, _BIG)
    col0 = jnp.where(valid, col0, _BIG)
    row1 = jnp.where(valid, row1, -1)
    col1 = jnp.where(valid, col1, -1)

    f32 = lambda a: a.astype(jnp.float32)
    face_data = jnp.concatenate([
        f32(row0)[:, None], f32(row1)[:, None],
        f32(col0)[:, None], f32(col1)[:, None],
        f32(jnp.arange(num_faces, dtype=jnp.int32))[:, None],
        f32(valid)[:, None],
        corners[..., 0],    # x0 x1 x2
        corners[..., 1],    # y0 y1 y2
    ], axis=1)
    pad_value = jnp.zeros((_DF,), jnp.float32).at[0].set(float(_BIG)).at[
        2].set(float(_BIG)).at[1].set(-1.0).at[3].set(-1.0).at[4].set(-1.0)
    face_data = jnp.concatenate(
        [face_data, jnp.tile(pad_value[None], (pad_rows, 1))], axis=0)
    return face_data


def _pack_grad_faces(vertices, faces, height, width, num_chunks, tiles_y,
                     tiles_x, chunk=None, tile_h=None, tile_w=None):
    """Face table for the gradient kernel: exact per-tile hits-first lists
    (see forward_pallas._pack_faces), with bboxes widened one pixel for
    dilation support.

    Returns (face_data [T, NC, CHUNK, _DF] f32, counts [T, 1, 1, 1, 1] i32,
    sorted_orig [T, NC * CHUNK] i32 mapping kernel rows to original faces).

    `chunk` / `tile_h` / `tile_w` default to this module's configuration;
    ops/grad_dense.py reuses the packer with its own shapes.
    """
    chunk = CHUNK if chunk is None else chunk
    tile_h = TILE_H if tile_h is None else tile_h
    tile_w = TILE_W if tile_w is None else tile_w
    num_faces = faces.shape[0]
    pad_rows = max(num_chunks * chunk, num_faces) - num_faces
    face_data = _grad_face_table(vertices, faces, height, width, pad_rows)
    base_orig = jnp.concatenate(
        [jnp.arange(num_faces, dtype=jnp.int32),
         jnp.zeros((pad_rows,), jnp.int32)])

    tile_r0 = jnp.arange(tiles_y, dtype=jnp.int32) * tile_h
    tile_c0 = jnp.arange(tiles_x, dtype=jnp.int32) * tile_w
    hit_rows = ((face_data[None, :, 0] <= (tile_r0 + tile_h - 1)[:, None])
                & (face_data[None, :, 1] >= tile_r0[:, None]))
    hit_cols = ((face_data[None, :, 2] <= (tile_c0 + tile_w - 1)[:, None])
                & (face_data[None, :, 3] >= tile_c0[:, None]))
    overlap = (hit_rows[:, None, :] & hit_cols[None, :, :]).reshape(
        tiles_y * tiles_x, -1)
    order = jnp.argsort(jnp.logical_not(overlap), axis=1, stable=True)
    counts = jnp.sum(overlap, axis=1).astype(jnp.int32)

    # Per-tile face cap (see forward_pallas.tile_face_cap).
    max_rows = num_chunks * chunk
    counts = jnp.minimum(counts, max_rows)
    order = order[:, :max_rows]
    tiled = jnp.take(face_data, order, axis=0).reshape(
        tiles_y * tiles_x, num_chunks, chunk, _DF)
    sorted_orig = jnp.take(base_orig, order, axis=0)   # [T, rows]
    return tiled, counts[:, None, None, None], sorted_orig


def _grad_kernel(count_ref, face_ref, pos_ref, col_ref, zeros_ref, out_ref,
                 *, num_chunks, channels, tiles_x):
    del zeros_ref  # aliased to out_ref; provides the zero initialisation
    # grid: (batch, tile, chunk); each (tile, chunk) owns its output block.
    chunk_idx = pl.program_id(2)

    # No kernel-side init: the output aliases a zeros input (SMEM blocks only
    # allow scalar element access, so a vectorised clear cannot lower).

    chunk_active = chunk_idx * CHUNK < count_ref[0, 0, 0, 0, 0]

    @pl.when(chunk_active)
    def _process():
        # Channel-major tile layouts: each plane is a clean zero-offset
        # (TILE_H, TILE_W) block (Mosaic cannot reduce lane-offset slices).
        # pos planes: (Ax, Ay, Px, Py, bd0, bd1, bd2, face_d)
        ax = pos_ref[0, 0]
        ay = pos_ref[0, 1]
        px = pos_ref[0, 2]
        py = pos_ref[0, 3]
        bd = [pos_ref[0, 4 + k] for k in range(3)]
        face_d = pos_ref[0, 7]
        # col planes: (bp0, bp1, bp2, face_pre, gp[0..C))
        bp = [col_ref[0, k] for k in range(3)]
        face_pre = col_ref[0, 3]
        gp = [col_ref[0, 4 + c] for c in range(channels)]

        def visit_face(j, _):
            # j < n_live implies the face hits this tile and is valid
            # (hits-first ordering; invalid faces have empty bboxes).
            fid = face_ref[0, 0, 0, j, 4]
            mask_d = face_d == fid
            cx = (bd[0] * face_ref[0, 0, 0, j, 6]
                  + bd[1] * face_ref[0, 0, 0, j, 7]
                  + bd[2] * face_ref[0, 0, 0, j, 8])
            cy = (bd[0] * face_ref[0, 0, 0, j, 9]
                  + bd[1] * face_ref[0, 0, 0, j, 10]
                  + bd[2] * face_ref[0, 0, 0, j, 11])
            p = px * cx + py * cy
            mask_pre = face_pre == fid
            stride = 3 + channels   # corner-major rows: gx gy gw gc...
            for k in range(3):
                wd = jnp.where(mask_d, bd[k], 0.0)
                out_ref[0, 0, 0, j, k * stride + 0] += jnp.sum(wd * ax)
                out_ref[0, 0, 0, j, k * stride + 1] += jnp.sum(wd * ay)
                out_ref[0, 0, 0, j, k * stride + 2] += -jnp.sum(wd * p)
                wp = jnp.where(mask_pre, bp[k], 0.0)
                for c in range(channels):
                    out_ref[0, 0, 0, j, k * stride + 3 + c] += jnp.sum(
                        wp * gp[c])
            return 0

        n_live = jnp.minimum(
            CHUNK, count_ref[0, 0, 0, 0, 0] - chunk_idx * CHUNK)
        jax.lax.fori_loop(0, n_live, visit_face, 0)


def rasterise_grad_batch(vertices, faces, pixels, grad_pixels, aux,
                         interpret=None):
    """Face-major Pallas gradient assembly; same contract and semantics as
    backward.rasterise_grad_batch (all arguments [B, ...])."""
    if interpret is None:
        from . import dispatch
        interpret = not dispatch.on_accelerator()

    from . import dispatch as _dispatch
    vertices, faces, pixels, grad_pixels, aux = _dispatch.guard_constants(
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(faces, jnp.int32),
        jnp.asarray(pixels, jnp.float32),
        jnp.asarray(grad_pixels, jnp.float32), aux)

    batch, height, width, channels = pixels.shape
    num_vertices = vertices.shape[1]
    num_faces = faces.shape[1]

    if num_faces == 0:
        # Nothing rasterised: every pixel is background, no vertex receives
        # gradient (mirrors forward_pallas.rasterise_batch's early-out; the
        # kernel path would otherwise gather into a [B, 0, 3] faces array).
        return backward.RasteriseGrads(
            grad_background=grad_pixels,
            grad_vertices=jnp.zeros((batch, num_vertices, 4), jnp.float32),
            grad_vertex_colors=jnp.zeros(
                (batch, num_vertices, channels), jnp.float32),
            debug=jnp.zeros((batch, height, width), jnp.float32))

    # --- elementwise XLA pre-pass ---
    pre = backward.grad_prepass(pixels, grad_pixels, aux)
    grad_background = pre.grad_background
    covered_pre = pre.covered_pre
    bary_d, face_d, dilated = pre.bary_d, pre.face_d, pre.dilated
    ax, ay, px_t, py_t = pre.ax, pre.ay, pre.px_t, pre.py_t

    num_chunks = max(1, _cdiv(
        forward_pallas.tile_face_cap(num_faces), CHUNK))
    if not interpret and not _os.environ.get("DIRT_TPU_ALLOW_SCALAR_GRAD"):
        # Mosaic miscompiles this kernel on real TPUs: multi-chunk
        # configurations produce wrong values / NaN (verified against the
        # XLA path on v5e with constant-folding guards in place, round 2),
        # and late in round 2 even a single-chunk multi-tile configuration
        # (40 faces, 64x128) returned wrong vertex/colour gradients -- with
        # DIFFERENT wrong values depending on whether the aux buffers were
        # jit arguments or closure constants, the signature of a layout-
        # sensitive miscompile, not a semantics bug (the same scene is
        # exact in interpreter mode, and the dense/blocks kernels are exact
        # compiled).  The kernel therefore refuses to run compiled; it
        # remains the scalar-reduction reference implementation for
        # interpreter-mode tests.  Set DIRT_TPU_ALLOW_SCALAR_GRAD=1 to run
        # it compiled anyway (for miscompile triage only).
        raise NotImplementedError(
            "grad_pallas miscompiles on real TPUs (wrong gradients; see "
            "module notes); use the dense gradient kernel "
            "(DIRT_TPU_GRAD_BACKEND=dense or auto), or set "
            "DIRT_TPU_ALLOW_SCALAR_GRAD=1 to run it anyway.")
    tiles_y = _cdiv(height, TILE_H)
    tiles_x = _cdiv(width, TILE_W)
    hp, wp = tiles_y * TILE_H, tiles_x * TILE_W

    def pad_hw(a):
        # a: [B, P, H, W] channel-major planes.
        return jnp.pad(a, ((0, 0), (0, 0), (0, hp - height),
                           (0, wp - width)))

    f32 = lambda a: a.astype(jnp.float32)
    # Channel-major [B, planes, H, W]: padded-region planes are all zero, so
    # any spurious face match there contributes exactly zero.
    pos_tab = pad_hw(jnp.stack(
        [ax, ay, px_t, py_t, bary_d[..., 0], bary_d[..., 1], bary_d[..., 2],
         f32(face_d)], axis=1))
    col_tab = pad_hw(jnp.concatenate([
        jnp.moveaxis(pre.bary_pre, -1, 1),
        f32(pre.face_pre)[:, None],
        jnp.moveaxis(grad_pixels, -1, 1),
    ], axis=1))

    num_tiles = tiles_y * tiles_x
    face_data, counts, sorted_orig = jax.vmap(
        functools.partial(_pack_grad_faces, height=height, width=width,
                          num_chunks=num_chunks, tiles_y=tiles_y,
                          tiles_x=tiles_x))(vertices, faces)

    d_out = 9 + 3 * channels
    kernel = functools.partial(
        _grad_kernel, num_chunks=num_chunks, channels=channels,
        tiles_x=tiles_x)

    face_grads = pl.pallas_call(
        kernel,
        grid=(batch, num_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, 1),
                         lambda b, t, c: (b, t, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, CHUNK, _DF),
                         lambda b, t, c: (b, t, c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE_H, TILE_W),
                         lambda b, t, c: (b, 0, t // tiles_x, t % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 + channels, TILE_H, TILE_W),
                         lambda b, t, c: (b, 0, t // tiles_x, t % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, CHUNK, d_out),
                         lambda b, t, c: (b, t, c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        # SMEM: the kernel accumulates per-face scalars (Mosaic cannot store
        # scalars to VMEM); zero-init arrives via the aliased zeros input.
        out_specs=pl.BlockSpec((1, 1, 1, CHUNK, d_out),
                               lambda b, t, c: (b, t, c, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_tiles, num_chunks, CHUNK, d_out), jnp.float32),
        input_output_aliases={4: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(counts, face_data, pos_tab, col_tab,
      jnp.zeros((batch, num_tiles, num_chunks, CHUNK, d_out), jnp.float32))

    # --- tiny face-corner -> vertex scatter (T*F rows, face-count sized) ---
    face_grads = face_grads.reshape(
        batch, num_tiles * num_chunks * CHUNK, 3, 3 + channels)
    corner_vids = jnp.take_along_axis(
        faces, sorted_orig.reshape(batch, -1)[..., None],
        axis=1)                                         # [B, T*NC*K, 3]
    batch_offsets = (jnp.arange(batch, dtype=jnp.int32)
                     * num_vertices)[:, None, None]
    seg = (corner_vids + batch_offsets).reshape(-1)
    rows = face_grads.reshape(-1, 3 + channels)
    summed = jax.ops.segment_sum(rows, seg,
                                 num_segments=batch * num_vertices)
    summed = summed.reshape(batch, num_vertices, 3 + channels)

    grad_vertices = jnp.stack([
        summed[..., 0], summed[..., 1],
        jnp.zeros_like(summed[..., 0]), summed[..., 2],
    ], axis=-1)
    grad_vertex_colors = summed[..., 3:]
    debug = jnp.where(dilated, 1.e-2, 0.0)
    return backward.RasteriseGrads(
        grad_background, grad_vertices, grad_vertex_colors, debug)
