"""Face-major Pallas TPU kernel for the gradient scatters (MXU formulation).

The analytic backward pass (ops/backward.py) ends in two large scatter-adds:
per-pixel bary-weighted contributions into grad_vertices / grad_vertex_colors
(atomicAdd in the reference, rasterise_grad_egl.cu:140,228-230; segment_sum
in the XLA path, ~20 ms per 3.1M rows on TPU v5e).  This kernel inverts the
loop and feeds the MXU:

  * XLA pre-pass (cheap, elementwise): Scharr, occluder dilation, and a set
    of face-INDEPENDENT per-pixel value planes
        b_k * Ax, b_k * Ay                       (position x/y terms)
        b_k * b_m * Px, b_k * b_m * Py           (clip-w chain-rule terms)
        bpre_k * grad_pixels_c                   (colour terms)
    with Ax = dl_dx * (W/2) / clip_w, Px = dl_dx * (W/2) / clip_w^2, etc.
    The face-specific corner clip x/y multiplying the Q terms factors OUT of
    the pixel sums (clip_x = sum_m b_m x_m), so every sum the gradient needs
    is a masked reduction of a face-independent plane.
  * Kernel: for each (tile, face chunk), build the winner-mask matrix
    M[face, pixel] by comparing the tile's face-id map against the chunk's
    face-id vector and compute ALL masked sums at once as the contraction
    S = M @ V -- one [CHUNK, TILE_W] x [planes, TILE_W] MXU dot_general per
    pixel row, accumulated in registers.  Faces are binned into exact
    per-tile hits-first lists (see forward_pallas._pack_faces) so only live
    chunks run.
  * XLA post-pass (face-count sized): combine the Q sums with corner clip
    x/y, then one tiny segment_sum from face corners to vertices.

Gradient semantics are identical to ops/backward.py (pre-dilation colour
weights, post-dilation position weights, viewport chain rule); tests compare
the two paths directly.
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import backward, forward_pallas, geometry

TILE_H = forward_pallas.TILE_H
TILE_W = forward_pallas.TILE_W
CHUNK = int(_os.environ.get("DIRT_TPU_GRAD_CHUNK", 256))
_BIG = forward_pallas._BIG

# Q-plane index pairs (symmetric b_k * b_m products).
_QPAIRS = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
_NPOS = 3 + 3 + 6 + 6   # b*Ax (3), b*Ay (3), Qx (6), Qy (6)


def _cdiv(a, b):
    return -(-a // b)


def _pack_grad_faces(vertices, faces, height, width, num_chunks, tiles_y,
                     tiles_x):
    """Per-tile hits-first face-id lists for the gradient kernel.

    Returns (face_ids [T, NC, CHUNK, 1] f32, counts [T, 1, 1, 1] i32,
    sorted_orig [T, NC * CHUNK] i32).  Bounding boxes are widened two pixels
    beyond the rasterised footprint: dilation moves gradient support one
    pixel out, plus one pixel of conservative rounding slack.
    """
    num_faces = faces.shape[0]
    setup = geometry.face_setup(vertices, faces)

    corners = jnp.take(vertices, faces, axis=0)
    w = corners[..., 3]
    safe_w = jnp.where(w > 0, w, 1.0)
    px = (corners[..., 0] / safe_w + 1.0) * (width / 2.0)
    py = (1.0 - corners[..., 1] / safe_w) * (height / 2.0)

    unbounded = jnp.any(w <= 0, axis=-1)
    col0 = jnp.floor(jnp.min(px, axis=-1) - 0.5).astype(jnp.int32) - 2
    col1 = jnp.ceil(jnp.max(px, axis=-1) - 0.5).astype(jnp.int32) + 2
    row0 = jnp.floor(jnp.min(py, axis=-1) - 0.5).astype(jnp.int32) - 2
    row1 = jnp.ceil(jnp.max(py, axis=-1) - 0.5).astype(jnp.int32) + 2
    col0 = jnp.where(unbounded, 0, jnp.clip(col0, 0, width - 1))
    col1 = jnp.where(unbounded, width - 1, jnp.clip(col1, 0, width - 1))
    row0 = jnp.where(unbounded, 0, jnp.clip(row0, 0, height - 1))
    row1 = jnp.where(unbounded, height - 1, jnp.clip(row1, 0, height - 1))

    valid = setup.valid
    row0 = jnp.where(valid, row0, _BIG)
    col0 = jnp.where(valid, col0, _BIG)
    row1 = jnp.where(valid, row1, -1)
    col1 = jnp.where(valid, col1, -1)

    pad_rows = num_chunks * CHUNK - num_faces
    pad = lambda a, v: jnp.concatenate(
        [a, jnp.full((pad_rows,), v, a.dtype)])
    row0, row1 = pad(row0, _BIG), pad(row1, -1)
    col0, col1 = pad(col0, _BIG), pad(col1, -1)
    base_orig = pad(jnp.arange(num_faces, dtype=jnp.int32), 0)
    # Padded list entries get face id -3: never matches real faces (>= 0),
    # background (-1), or the padded-pixel marker (-2).
    base_fid = pad(jnp.arange(num_faces, dtype=jnp.int32), -3)

    tile_r0 = jnp.arange(tiles_y, dtype=jnp.int32) * TILE_H
    tile_c0 = jnp.arange(tiles_x, dtype=jnp.int32) * TILE_W
    hit_rows = ((row0[None] <= (tile_r0 + TILE_H - 1)[:, None])
                & (row1[None] >= tile_r0[:, None]))
    hit_cols = ((col0[None] <= (tile_c0 + TILE_W - 1)[:, None])
                & (col1[None] >= tile_c0[:, None]))
    overlap = (hit_rows[:, None, :] & hit_cols[None, :, :]).reshape(
        tiles_y * tiles_x, -1)
    order = jnp.argsort(jnp.logical_not(overlap), axis=1, stable=True)
    counts = jnp.sum(overlap, axis=1).astype(jnp.int32)

    face_ids = jnp.take(base_fid, order, axis=0).astype(jnp.float32)
    # Stored column-shaped so the kernel gets [CHUNK, 1] without a relayout.
    face_ids = face_ids.reshape(tiles_y * tiles_x, num_chunks, CHUNK, 1)
    sorted_orig = jnp.take(base_orig, order, axis=0)
    return face_ids, counts[:, None, None, None], sorted_orig


def _grad_kernel(count_ref, fid_ref, pos_ref, col_ref, pos_out, col_out,
                 *, num_chunks, n_col):
    # grid: (batch, tile, chunk); each (tile, chunk) owns its output block.
    chunk_idx = pl.program_id(2)
    active = chunk_idx * CHUNK < count_ref[0, 0, 0, 0, 0]

    pos_out[0, 0] = jnp.zeros((CHUNK, _NPOS), jnp.float32)
    col_out[0, 0] = jnp.zeros((CHUNK, n_col), jnp.float32)

    @pl.when(active)
    def _process():
        fid_col = fid_ref[0, 0, 0]                      # [CHUNK, 1]
        lanes = 4   # independent accumulators: the MXU is latency-bound on a
                    # single accumulate dependency chain

        def one_row(r):
            face_d_row = pos_ref[0, 0, r, :][None, :]       # [1, TW]
            face_p_row = pos_ref[0, 1, r, :][None, :]
            mask_d = (face_d_row == fid_col).astype(jnp.float32)  # [K, TW]
            mask_p = (face_p_row == fid_col).astype(jnp.float32)
            vpos_row = pos_ref[0, 2:, r, :]                 # [NPOS, TW]
            vcol_row = col_ref[0, :, r, :]                  # [n_col, TW]
            # HIGHEST precision: the default single-bf16-pass matmul loses
            # ~3 decimal digits of the value planes (masks are exact either
            # way); gradients must match the f32 reference path.
            s_pos = jax.lax.dot_general(
                mask_d, vpos_row, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            s_col = jax.lax.dot_general(
                mask_p, vcol_row, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            return s_pos, s_col

        def row_body(i, acc):
            new = []
            for lane in range(lanes):
                acc_pos, acc_col = acc[lane]
                s_pos, s_col = one_row(i * lanes + lane)
                new.append((acc_pos + s_pos, acc_col + s_col))
            return tuple(new)

        zeros = lambda: (jnp.zeros((CHUNK, _NPOS), jnp.float32),
                         jnp.zeros((CHUNK, n_col), jnp.float32))
        acc = jax.lax.fori_loop(0, TILE_H // lanes, row_body,
                                tuple(zeros() for _ in range(lanes)))
        pos_out[0, 0] = sum(a for a, _ in acc)
        col_out[0, 0] = sum(c for _, c in acc)


def rasterise_grad_batch(vertices, faces, pixels, grad_pixels, aux,
                         interpret=None):
    """MXU face-major gradient assembly; same contract and semantics as
    backward.rasterise_grad_batch (all arguments [B, ...])."""
    if interpret is None:
        from . import dispatch
        interpret = not dispatch.on_accelerator()

    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    pixels = jnp.asarray(pixels, jnp.float32)
    grad_pixels = jnp.asarray(grad_pixels, jnp.float32)

    batch, height, width, channels = pixels.shape
    num_vertices = vertices.shape[1]
    num_faces = faces.shape[1]
    n_col = 3 * channels

    # --- elementwise XLA pre-pass ---
    scharr_x, scharr_y = jax.vmap(backward.scharr_filters)(pixels)
    covered_pre = aux.indices[..., 0] >= 0
    grad_background = jnp.where(covered_pre[..., None], 0.0, grad_pixels)

    _, bary_d, clip_w_d, dilated, face_d = jax.vmap(backward._dilate)(
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

    b = [bary_d[..., k] for k in range(3)]
    bp = jnp.where(covered_pre[..., None], aux.barycentric, 0.0)
    planes_pos = (
        [face_d.astype(jnp.float32),
         aux.face_index.astype(jnp.float32)]
        + [b[k] * ax for k in range(3)]
        + [b[k] * ay for k in range(3)]
        + [b[k] * b[m] * px_t for k, m in _QPAIRS]
        + [b[k] * b[m] * py_t for k, m in _QPAIRS])
    planes_col = [bp[..., k] * grad_pixels[..., c]
                  for k in range(3) for c in range(channels)]

    num_chunks = max(1, _cdiv(num_faces, CHUNK))
    tiles_y = _cdiv(height, TILE_H)
    tiles_x = _cdiv(width, TILE_W)
    num_tiles = tiles_y * tiles_x
    hp, wp = tiles_y * TILE_H, tiles_x * TILE_W

    def pad_hw(a):
        return jnp.pad(a, ((0, 0), (0, 0), (0, hp - height),
                           (0, wp - width)))

    pos_tab = pad_hw(jnp.stack(planes_pos, axis=1))
    # Padded pixels must match no face id: overwrite the zero padding of the
    # two id planes with -2 (value planes stay 0, contributing nothing).
    if hp > height:
        pos_tab = pos_tab.at[:, 0:2, height:, :].set(-2.0)
    if wp > width:
        pos_tab = pos_tab.at[:, 0:2, :, width:].set(-2.0)
    col_tab = pad_hw(jnp.stack(planes_col, axis=1))

    face_ids, counts, sorted_orig = jax.vmap(
        functools.partial(_pack_grad_faces, height=height, width=width,
                          num_chunks=num_chunks, tiles_y=tiles_y,
                          tiles_x=tiles_x))(vertices, faces)

    kernel = functools.partial(
        _grad_kernel, num_chunks=num_chunks, n_col=n_col)

    sums_pos, sums_col = pl.pallas_call(
        kernel,
        grid=(batch, num_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, 1),
                         lambda b_, t, c: (b_, t, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, CHUNK, 1),
                         lambda b_, t, c: (b_, t, c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 + _NPOS, TILE_H, TILE_W),
                         lambda b_, t, c: (b_, 0, t // tiles_x, t % tiles_x),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_col, TILE_H, TILE_W),
                         lambda b_, t, c: (b_, 0, t // tiles_x, t % tiles_x),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, CHUNK, _NPOS),
                         lambda b_, t, c: (b_, t * num_chunks + c, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK, n_col),
                         lambda b_, t, c: (b_, t * num_chunks + c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_tiles * num_chunks, CHUNK, _NPOS), jnp.float32),
            jax.ShapeDtypeStruct(
                (batch, num_tiles * num_chunks, CHUNK, n_col), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(counts, face_ids, pos_tab, col_tab)

    # --- XLA post-pass: face-dependent combination + tiny scatter ---
    rows_n = num_tiles * num_chunks * CHUNK
    sums_pos = sums_pos.reshape(batch, rows_n, _NPOS)
    sums_col = sums_col.reshape(batch, rows_n, 3, channels)
    orig = sorted_orig.reshape(batch, rows_n)

    corner_vids = jnp.take_along_axis(faces, orig[..., None], axis=1)
    cx = jnp.take_along_axis(
        vertices[..., 0], corner_vids.reshape(batch, -1), axis=1
    ).reshape(batch, rows_n, 3)
    cy = jnp.take_along_axis(
        vertices[..., 1], corner_vids.reshape(batch, -1), axis=1
    ).reshape(batch, rows_n, 3)

    gx = sums_pos[..., 0:3]
    gy = sums_pos[..., 3:6]
    qx = sums_pos[..., 6:12]
    qy = sums_pos[..., 12:18]
    qindex = {pair: i for i, pair in enumerate(_QPAIRS)}
    gw = []
    for k in range(3):
        total = 0.
        for m in range(3):
            i = qindex[(min(k, m), max(k, m))]
            total = total + cx[..., m] * qx[..., i] + cy[..., m] * qy[..., i]
        gw.append(-total)
    gw = jnp.stack(gw, axis=-1)                                  # [B, R, 3]

    rows = jnp.concatenate([
        jnp.stack([gx, gy, gw], axis=-1),                        # [B, R, 3, 3]
        sums_col,                                                # [B, R, 3, C]
    ], axis=-1).reshape(-1, 3 + channels)
    batch_offsets = (jnp.arange(batch, dtype=jnp.int32)
                     * num_vertices)[:, None, None]
    seg = (corner_vids + batch_offsets).reshape(-1)
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
