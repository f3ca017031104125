"""Tile-binned Pallas TPU rasterisation kernel.

This is the TPU-native replacement for the role OpenGL hardware plays in the
reference (triangle setup units + raster units + depth test,
csrc/rasterise_egl.cpp:362-380): a `pl.pallas_call` over a
(batch, tile_row, tile_col, face_chunk) grid that z-buffers every face chunk
against every image tile held resident in VMEM.

Pipeline:
  1. XLA precompute (`_pack_faces`): per-face edge coefficients/z/w/accept
     from ops/geometry.py, conservative pixel bounding boxes, Morton-order
     spatial sort (so face chunks are spatially coherent and the per-chunk
     bounding boxes stay tight), packing into a flat [chunks, K, 24] table.
  2. Pallas kernel (`_raster_kernel`): per (tile, chunk) step, skip the chunk
     if its bbox misses the tile; otherwise loop its K faces, skipping faces
     whose bboxes miss the tile, and for the rest evaluate homogeneous edge
     functions over the whole tile on the VPU, depth-testing against the
     resident tile buffers.  Depth ties resolve to the smallest *original*
     face index, which reproduces GL draw order regardless of the sort.
  3. Shared XLA postprocess (ops/reference.shade_pixels): gathers the winning
     faces' attributes, interpolates perspective-correctly, composites over
     the background and emits the aux buffers (barycentrics / clip-w /
     index triples) as custom_vjp residuals.

The per-pixel binning/atlas bookkeeping of the reference (framebuffer atlas
over sqrt(batch) frames, rasterise_egl.cpp:326-334) is replaced by the grid's
batch dimension: each image's tiles live in VMEM only while being produced.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import geometry, reference

# Tile shape: lanes want 128; 32 sublanes keeps depth+index buffers at 32 KB
# and amortises per-face work over 4 VPU registers of pixels.  Env-overridable
# for tuning (read once at import).
import os as _os
TILE_H = int(_os.environ.get("DIRT_TPU_TILE_H", 32))
TILE_W = int(_os.environ.get("DIRT_TPU_TILE_W", 128))
CHUNK = int(_os.environ.get("DIRT_TPU_CHUNK", 128))   # faces per grid step
_D = 24              # packed floats per face (see _pack_faces layout)
_BIG = np.int32(1 << 30)


def _cdiv(a, b):
    return -(-a // b)


def _part1by1(x):
    """Interleaves zeros between the low 16 bits of x (for Morton codes)."""
    x = x & 0xFFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _pack_faces(vertices, faces, height, width, num_chunks):
    """Packs per-face raster constants for one image into the kernel layout.

    Returns:
        face_data: [num_chunks, CHUNK, 24] float32 --
            [0:9]   edge coefficients e (row-major 3x3)
            [9:12]  corner clip z
            [12:15] corner clip w
            [15:18] fill-rule accept bits (0.0 / 1.0)
            [18]    valid flag
            [19]    original face index (exact in f32 below 2^24, the same
                    bound the reference's float-encoded indices impose,
                    rasterise_grad_egl.cpp:399-405)
            [20:24] pixel bbox (row0, row1, col0, col1), inclusive
        chunk_meta: [num_chunks, 4] int32 per-chunk union bbox.
    """
    num_faces = faces.shape[0]
    setup = geometry.face_setup(vertices, faces)

    corners = jnp.take(vertices, faces, axis=0)          # [F, 3, 4]
    w = corners[..., 3]
    safe_w = jnp.where(w > 0, w, 1.0)
    sx = corners[..., 0] / safe_w
    sy = corners[..., 1] / safe_w
    px = (sx + 1.0) * (width / 2.0)
    py = (1.0 - sy) * (height / 2.0)

    # Conservative pixel bbox (+/- 1 pixel of rounding slack); faces with any
    # w <= 0 may wrap through infinity, so they get the full screen.
    unbounded = jnp.any(w <= 0, axis=-1)
    col0 = jnp.floor(jnp.min(px, axis=-1) - 0.5).astype(jnp.int32) - 1
    col1 = jnp.ceil(jnp.max(px, axis=-1) - 0.5).astype(jnp.int32) + 1
    row0 = jnp.floor(jnp.min(py, axis=-1) - 0.5).astype(jnp.int32) - 1
    row1 = jnp.ceil(jnp.max(py, axis=-1) - 0.5).astype(jnp.int32) + 1
    col0 = jnp.where(unbounded, 0, jnp.clip(col0, 0, width - 1))
    col1 = jnp.where(unbounded, width - 1, jnp.clip(col1, 0, width - 1))
    row0 = jnp.where(unbounded, 0, jnp.clip(row0, 0, height - 1))
    row1 = jnp.where(unbounded, height - 1, jnp.clip(row1, 0, height - 1))

    # Degenerate faces rasterise nothing: give them an empty bbox so they
    # cannot enlarge chunk bboxes (the kernel also checks the valid flag).
    valid = setup.valid
    row0 = jnp.where(valid, row0, _BIG)
    col0 = jnp.where(valid, col0, _BIG)
    row1 = jnp.where(valid, row1, -1)
    col1 = jnp.where(valid, col1, -1)

    # Morton-order sort on bbox-centre tile coordinates keeps chunks
    # spatially tight; invalid faces sort to the end.
    tcx = jnp.clip((col0 + col1) // 2, 0, width - 1) // TILE_W
    tcy = jnp.clip((row0 + row1) // 2, 0, height - 1) // TILE_H
    morton = _part1by1(tcx) | (_part1by1(tcy) << 1)
    morton = jnp.where(valid, morton, jnp.int32(np.int32(0x7FFFFFFF)))
    order = jnp.argsort(morton)

    f32 = lambda a: a.astype(jnp.float32)
    face_data = jnp.concatenate([
        setup.e.reshape(num_faces, 9),
        setup.z, setup.w,
        f32(setup.accept),
        f32(valid)[:, None],
        f32(jnp.arange(num_faces, dtype=jnp.int32))[:, None],
        f32(row0)[:, None], f32(row1)[:, None],
        f32(col0)[:, None], f32(col1)[:, None],
    ], axis=1)
    face_data = jnp.take(face_data, order, axis=0)

    padded = num_chunks * CHUNK
    pad_rows = padded - num_faces
    pad_value = jnp.zeros((_D,), jnp.float32).at[20].set(float(_BIG)).at[22].set(
        float(_BIG)).at[21].set(-1.0).at[23].set(-1.0)
    face_data = jnp.concatenate(
        [face_data, jnp.tile(pad_value[None], (pad_rows, 1))], axis=0)
    face_data = face_data.reshape(num_chunks, CHUNK, _D)

    chunk_meta = jnp.stack([
        jnp.min(face_data[..., 20], axis=1).astype(jnp.int32),
        jnp.max(face_data[..., 21], axis=1).astype(jnp.int32),
        jnp.min(face_data[..., 22], axis=1).astype(jnp.int32),
        jnp.max(face_data[..., 23], axis=1).astype(jnp.int32),
    ], axis=1)
    # Trailing singleton keeps the TPU block shape (1, 1, 1, 4) legal: the
    # last two block dims must equal the array dims.
    return face_data, chunk_meta[:, None, :]


def _raster_kernel(meta_ref, face_ref, depth_ref, index_ref, *, height, width,
                   num_chunks):
    chunk_idx = pl.program_id(3)
    tile_row = pl.program_id(1) * TILE_H
    tile_col = pl.program_id(2) * TILE_W

    @pl.when(chunk_idx == 0)
    def _init():
        # glClearDepth(1.0) equivalent; -1 marks background.
        depth_ref[0] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
        index_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    chunk_r0 = meta_ref[0, 0, 0, 0]
    chunk_r1 = meta_ref[0, 0, 0, 1]
    chunk_c0 = meta_ref[0, 0, 0, 2]
    chunk_c1 = meta_ref[0, 0, 0, 3]
    chunk_hits_tile = ((chunk_r0 <= tile_row + TILE_H - 1)
                       & (chunk_r1 >= tile_row)
                       & (chunk_c0 <= tile_col + TILE_W - 1)
                       & (chunk_c1 >= tile_col))

    @pl.when(chunk_hits_tile)
    def _process_chunk():
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
        # Pixel-centre NDC, identical expression to geometry.pixel_centre_ndc.
        xg = ((tile_col + cols).astype(jnp.float32) + 0.5) * (2.0 / width) - 1.0
        yg = 1.0 - ((tile_row + rows).astype(jnp.float32) + 0.5) * (2.0 / height)

        def visit_face(j, _):
            face_r0 = face_ref[0, 0, j, 20]
            face_r1 = face_ref[0, 0, j, 21]
            face_c0 = face_ref[0, 0, j, 22]
            face_c1 = face_ref[0, 0, j, 23]
            face_hits_tile = (
                (face_r0 <= tile_row + TILE_H - 1) & (face_r1 >= tile_row)
                & (face_c0 <= tile_col + TILE_W - 1) & (face_c1 >= tile_col))

            @pl.when(face_hits_tile)
            def _raster_face():
                E0 = (face_ref[0, 0, j, 0] * xg + face_ref[0, 0, j, 1] * yg
                      + face_ref[0, 0, j, 2])
                E1 = (face_ref[0, 0, j, 3] * xg + face_ref[0, 0, j, 4] * yg
                      + face_ref[0, 0, j, 5])
                E2 = (face_ref[0, 0, j, 6] * xg + face_ref[0, 0, j, 7] * yg
                      + face_ref[0, 0, j, 8])
                s_z = (E0 * face_ref[0, 0, j, 9] + E1 * face_ref[0, 0, j, 10]
                       + E2 * face_ref[0, 0, j, 11])
                s_w = (E0 * face_ref[0, 0, j, 12] + E1 * face_ref[0, 0, j, 13]
                       + E2 * face_ref[0, 0, j, 14])
                a0 = face_ref[0, 0, j, 15] != 0.0
                a1 = face_ref[0, 0, j, 16] != 0.0
                a2 = face_ref[0, 0, j, 17] != 0.0
                in_p = (((E0 > 0) | ((E0 == 0) & a0))
                        & ((E1 > 0) | ((E1 == 0) & a1))
                        & ((E2 > 0) | ((E2 == 0) & a2)))
                in_n = (((E0 < 0) | ((E0 == 0) & ~a0))
                        & ((E1 < 0) | ((E1 == 0) & ~a1))
                        & ((E2 < 0) | ((E2 == 0) & ~a2)))
                cov_p = in_p & (s_w > 0) & (s_z >= -s_w) & (s_z <= s_w)
                cov_n = in_n & (s_w < 0) & (s_z <= -s_w) & (s_z >= s_w)
                covered = (cov_p | cov_n) & (face_ref[0, 0, j, 18] != 0.0)
                depth = jnp.where(covered, s_z / s_w, jnp.inf)

                face_index = face_ref[0, 0, j, 19].astype(jnp.int32)
                best_depth = depth_ref[0]
                best_index = index_ref[0]
                # GL_LESS + draw-order ties == lexicographic (depth, index).
                better = covered & (
                    (depth < best_depth)
                    | ((depth == best_depth) & (face_index < best_index)))
                depth_ref[0] = jnp.where(better, depth, best_depth)
                index_ref[0] = jnp.where(better, face_index, best_index)

            return 0

        jax.lax.fori_loop(0, CHUNK, visit_face, 0)


def visibility_pallas(vertices, faces, height, width, interpret=None):
    """Winning face index per pixel for a batch, via the Pallas kernel.

    Args:
        vertices: [B, V, 4]; faces: [B, F, 3]; height/width: ints.

    Returns:
        best_index [B, height, width] int32, -1 where background.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    batch, num_faces = faces.shape[0], faces.shape[1]
    num_chunks = max(1, _cdiv(num_faces, CHUNK))
    tiles_y = _cdiv(height, TILE_H)
    tiles_x = _cdiv(width, TILE_W)

    face_data, chunk_meta = jax.vmap(
        functools.partial(_pack_faces, height=height, width=width,
                          num_chunks=num_chunks))(vertices, faces)

    kernel = functools.partial(
        _raster_kernel, height=height, width=width, num_chunks=num_chunks)

    grid = (batch, tiles_y, tiles_x, num_chunks)
    depth, index = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, 4),
                         lambda b, ty, tx, c: (b, c, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, CHUNK, _D),
                         lambda b, ty, tx, c: (b, c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda b, ty, tx, c: (b, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_H, TILE_W),
                         lambda b, ty, tx, c: (b, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, tiles_y * TILE_H, tiles_x * TILE_W), jnp.float32),
            jax.ShapeDtypeStruct(
                (batch, tiles_y * TILE_H, tiles_x * TILE_W), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(chunk_meta, face_data)
    del depth
    return index[:, :height, :width]


def rasterise_batch(background, vertices, vertex_colors, faces,
                    interpret=None):
    """Batched forward rasterisation via the Pallas kernel.

    Same contract as ops/reference.rasterise_batch; shares its shading
    postprocess so the two backends produce identical images whenever they
    agree on visibility.
    """
    background = jnp.asarray(background, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    batch, height, width = background.shape[0], background.shape[1], background.shape[2]
    if faces.shape[1] == 0:
        return jax.vmap(reference.shade_pixels)(
            jnp.full((batch, height, width), -1, jnp.int32),
            geometry.face_setup(vertices, faces), faces, vertex_colors,
            background)

    best_index = visibility_pallas(vertices, faces, height, width, interpret)
    setup = geometry.face_setup(vertices, faces)
    return jax.vmap(reference.shade_pixels)(
        best_index, setup, faces, vertex_colors, background)
