"""Face tables for the Pallas gradient kernels.

Shared by the chunk-dense (ops/grad_dense.py) and block-binned
(ops/grad_blocks.py) gradient kernels: per-face raster constants with
dilation-widened pixel bboxes, and the exact per-tile hits-first packing.
This replaces the role of the reference's `upload_vertices` expansion
(csrc/rasterise_grad_egl.cu:12-49), which gathers face corners into an
interleaved vertex stream for the backward re-render; here the backward
pass needs only corner x/y (for the viewport w-term) and the face's
original index, at face count, not pixel count.
"""

import jax
import jax.numpy as jnp

from . import forward_pallas, geometry

_BIG = forward_pallas._BIG
# Face-table floats: bbox(4), orig idx, valid, corner x0 x1 x2 y0 y1 y2,
# then the 9 edge coefficients (cols 12-20, for the binning half-plane
# cull only -- the gradient kernels never read past col 11).
_DF = 21


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
        setup.e.reshape(num_faces, 9),
    ], axis=1)
    pad_value = jnp.zeros((_DF,), jnp.float32).at[0].set(float(_BIG)).at[
        2].set(float(_BIG)).at[1].set(-1.0).at[3].set(-1.0).at[4].set(-1.0)
    face_data = jnp.concatenate(
        [face_data, jnp.tile(pad_value[None], (pad_rows, 1))], axis=0)
    return face_data


def _pack_grad_faces(vertices, faces, height, width, num_chunks, tiles_y,
                     tiles_x, chunk, tile_h, tile_w):
    """Face table for the gradient kernels: exact per-tile hits-first lists
    (see forward_pallas._pack_faces), with bboxes widened one pixel for
    dilation support.

    Returns (face_data [T, NC, CHUNK, _DF] f32, counts [T, 1, 1, 1, 1] i32,
    sorted_orig [T, NC * CHUNK] i32 mapping kernel rows to original faces).
    """
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

    # Per-tile face cap (see forward_pallas.tile_face_cap).  Truncation here
    # is signalled by the forward pass over the same geometry (its narrower
    # bboxes give a near-subset schedule) via RasterAux.dropped.
    max_rows = num_chunks * chunk
    counts = jnp.minimum(counts, max_rows)
    order = order[:, :max_rows]
    tiled = jnp.take(face_data, order, axis=0).reshape(
        tiles_y * tiles_x, num_chunks, chunk, _DF)
    sorted_orig = jnp.take(base_orig, order, axis=0)   # [T, rows]
    return tiled, counts[:, None, None, None], sorted_orig
