"""Block-binned face-major Pallas TPU kernel for the gradient scatters.

Same gradient math as ops/grad_dense.py (dense [CHUNK, PIX] masked VPU
reductions; semantics of the reference's assemble_grads,
csrc/rasterise_grad_egl.cu:93-236), restructured for large meshes:

  * The face table is stored once per image at [num_blocks, CHUNK, _DF]
    (faces grouped into blocks of CHUNK consecutive draw-order faces), like
    the forward's block binning (ops/forward_blocks.py).
  * The grid is FACE-MAJOR: (batch, block, tile-slot).  Each block carries a
    prefetched list of the tiles its member bboxes overlap; the kernel
    accumulates the block's per-face sums across its tiles into ONE
    [CHUNK, d_out] output block (revisited on consecutive grid steps, the
    standard Pallas accumulation pattern).  Output memory is O(faces), not
    the O(tiles x face-slots) of the tile-major layout -- which is what
    OOMs at 65,536 faces (a 4 GB partial-sum array plus its padded
    reshape), exactly the scatter-memory blow-up SURVEY.md section 7
    warned about.
  * Inactive tail slots repeat the previous tile id so consecutive steps
    re-use the resident planes block (no DMA) and are skipped.

The trade vs the tile-major grad_dense kernel: the pixel-plane block
(~n_planes x TILE_H*TILE_W floats) streams once per (block, tile) visit
instead of once per tile, so for small meshes with many blocks per tile the
dense kernel wins -- dispatch keeps it below DIRT_TPU_BLOCKS_THRESHOLD.

The gradient bboxes are one pixel wider than the forward's (dilation
support), so the binning is computed from the gradient face table.
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import backward, grad_pallas

TILE_H = int(_os.environ.get("DIRT_TPU_GRAD_BLOCKS_TILE_H", 32))
TILE_W = int(_os.environ.get("DIRT_TPU_GRAD_BLOCKS_TILE_W", 128))
CHUNK = int(_os.environ.get("DIRT_TPU_GRAD_BLOCKS_CHUNK", 64))


def _cdiv(a, b):
    return -(-a // b)


def _block_tile_bins(face_data, num_blocks, chunk, num_slots,
                     tiles_y, tiles_x, tile_h, tile_w):
    """Per-BLOCK lists of hitting tiles for one image (transpose of
    forward_blocks.block_bins).  face_data: [num_blocks * chunk, _DF] with
    the gradient bbox in columns 0-3.

    Returns (tile_ids [NB, num_slots] i32 -- hitting tiles first, then the
    last id repeated; n_tiles [NB] i32 clamped to num_slots)."""
    tile_r0 = jnp.arange(tiles_y, dtype=jnp.int32) * tile_h
    tile_c0 = jnp.arange(tiles_x, dtype=jnp.int32) * tile_w
    hit_rows = ((face_data[None, :, 0] <= (tile_r0 + tile_h - 1)[:, None])
                & (face_data[None, :, 1] >= tile_r0[:, None]))
    hit_cols = ((face_data[None, :, 2] <= (tile_c0 + tile_w - 1)[:, None])
                & (face_data[None, :, 3] >= tile_c0[:, None]))
    overlap = (hit_rows[:, None, :] & hit_cols[None, :, :]).reshape(
        tiles_y * tiles_x, num_blocks, chunk)
    hit = jnp.any(overlap, axis=-1).T                          # [NB, T]
    order = jnp.argsort(jnp.logical_not(hit), axis=1,
                        stable=True).astype(jnp.int32)         # [NB, T]
    n_tiles = jnp.minimum(jnp.sum(hit, axis=1).astype(jnp.int32),
                          num_slots)                           # [NB]
    order = order[:, :num_slots]
    last = jnp.take_along_axis(
        order, jnp.maximum(n_tiles - 1, 0)[:, None], axis=1)
    active = (jnp.arange(num_slots, dtype=jnp.int32)[None, :]
              < n_tiles[:, None])
    tile_ids = jnp.where(active, order, last)
    return tile_ids, n_tiles


def _grad_kernel(ntile_ref, tileids_ref, face_ref, planes_ref, out_ref,
                 *, channels):
    del tileids_ref  # consumed by the planes BlockSpec's index_map
    batch_idx = pl.program_id(0)
    block_idx = pl.program_id(1)
    slot = pl.program_id(2)
    d_out = 9 + 3 * channels

    @pl.when(slot == 0)
    def _init():
        out_ref[0, 0] = jnp.zeros((CHUNK, d_out), jnp.float32)

    @pl.when(slot < ntile_ref[batch_idx, block_idx])
    def _process():
        def plane(i):
            return planes_ref[0, 0, i:i + 1, :]            # [1, PIX]

        def col(i):
            return face_ref[0, 0, :, i:i + 1]              # [CHUNK, 1]

        # Plane order identical to ops/grad_dense.py:
        #   0 ax, 1 ay, 2 Px, 3 Py, 4-6 bary_d, 7 face_d,
        #   8-10 bary_pre, 11 face_pre, 12.. grad_pixels channels
        fid = col(4)
        mask_d = plane(7) == fid
        mask_pre = plane(11) == fid

        cx = (plane(4) * col(6) + plane(5) * col(7)) + plane(6) * col(8)
        cy = (plane(4) * col(9) + plane(5) * col(10)) + plane(6) * col(11)
        p = plane(2) * cx + plane(3) * cy

        def rsum(a):
            return jnp.sum(a, axis=1, keepdims=True)

        sums = []
        for k in range(3):
            wd = jnp.where(mask_d, plane(4 + k), 0.0)
            sums.append(rsum(wd * plane(0)))               # gx_k
            sums.append(rsum(wd * plane(1)))               # gy_k
            sums.append(-rsum(wd * p))                     # gw_k
            wp = jnp.where(mask_pre, plane(8 + k), 0.0)
            for c in range(channels):
                sums.append(rsum(wp * plane(12 + c)))      # gcolor_kc
        out_ref[0, 0] += jnp.concatenate(sums, axis=1)     # [CHUNK, d_out]


def rasterise_grad_batch(vertices, faces, pixels, grad_pixels, aux,
                         interpret=None):
    """Block-binned face-major gradient assembly; contract and semantics
    identical to backward.rasterise_grad_batch (all arguments [B, ...])."""
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
        return backward.RasteriseGrads(
            grad_background=grad_pixels,
            grad_vertices=jnp.zeros((batch, num_vertices, 4), jnp.float32),
            grad_vertex_colors=jnp.zeros(
                (batch, num_vertices, channels), jnp.float32),
            debug=jnp.zeros((batch, height, width), jnp.float32))

    pre = backward.grad_prepass(pixels, grad_pixels, aux)

    num_blocks = _cdiv(num_faces, CHUNK)
    tiles_y = _cdiv(height, TILE_H)
    tiles_x = _cdiv(width, TILE_W)
    num_tiles = tiles_y * tiles_x
    num_slots = num_tiles   # exact: a block may overlap every tile
    hp, wp = tiles_y * TILE_H, tiles_x * TILE_W
    pix = TILE_H * TILE_W
    n_planes = 12 + channels
    d_out = 9 + 3 * channels

    f32 = lambda a: a.astype(jnp.float32)
    planes = jnp.concatenate([
        jnp.stack([pre.ax, pre.ay, pre.px_t, pre.py_t], axis=1),
        jnp.moveaxis(pre.bary_d, -1, 1),
        f32(pre.face_d)[:, None],
        jnp.moveaxis(pre.bary_pre, -1, 1),
        f32(pre.face_pre)[:, None],
        jnp.moveaxis(grad_pixels, -1, 1),
    ], axis=1)                                        # [B, NP, H, W]
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - height),
                              (0, wp - width)))
    planes = planes.reshape(batch, n_planes, tiles_y, TILE_H, tiles_x, TILE_W)
    planes = planes.transpose(0, 2, 4, 1, 3, 5).reshape(
        batch, num_tiles, n_planes, pix)

    def pack_one(v, f):
        face_data = grad_pallas._grad_face_table(
            v, f, height, width, num_blocks * CHUNK - num_faces)
        tile_ids, n_tiles = _block_tile_bins(
            face_data, num_blocks, CHUNK, num_slots,
            tiles_y, tiles_x, TILE_H, TILE_W)
        return face_data.reshape(num_blocks, CHUNK, grad_pallas._DF), \
            tile_ids, n_tiles

    face_table, tile_ids, n_tiles = jax.vmap(pack_one)(vertices, faces)

    kernel = functools.partial(_grad_kernel, channels=channels)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_blocks, num_slots),
        in_specs=[
            # Resident across the block's tile sweep.
            pl.BlockSpec((1, 1, CHUNK, grad_pallas._DF),
                         lambda b, nb, s, ntl, ids: (b, nb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_planes, pix),
                         lambda b, nb, s, ntl, ids: (b, ids[b, nb, s], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CHUNK, d_out),
                               lambda b, nb, s, ntl, ids: (b, nb, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    face_grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_blocks, CHUNK, d_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(n_tiles, tile_ids, face_table, planes)

    # Rows map 1:1 to faces in draw order (block nb, offset j -> nb*CHUNK+j);
    # padded tail rows are zero (their face slots have empty bboxes, so no
    # tile lists them) and scatter harmlessly via clipped ids.
    face_grads = face_grads.reshape(
        batch, num_blocks * CHUNK, 3, 3 + channels)
    pad_faces = num_blocks * CHUNK - num_faces
    faces_padded = jnp.pad(faces, ((0, 0), (0, pad_faces), (0, 0)))
    batch_offsets = (jnp.arange(batch, dtype=jnp.int32)
                     * num_vertices)[:, None, None]
    seg = (faces_padded + batch_offsets).reshape(-1)
    rows = face_grads.reshape(-1, 3 + channels)
    summed = jax.ops.segment_sum(rows, seg,
                                 num_segments=batch * num_vertices)
    summed = summed.reshape(batch, num_vertices, 3 + channels)

    grad_vertices = jnp.stack([
        summed[..., 0], summed[..., 1],
        jnp.zeros_like(summed[..., 0]), summed[..., 2],
    ], axis=-1)
    grad_vertex_colors = summed[..., 3:]
    debug = jnp.where(pre.dilated, 1.e-2, 0.0)
    return backward.RasteriseGrads(
        pre.grad_background, grad_vertices, grad_vertex_colors, debug)
