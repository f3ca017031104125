"""Block-binned dense Pallas TPU rasterisation kernel (large-mesh path).

Same kernel math as ops/forward_dense.py (dense [CHUNK, PIX] vector planes,
lexicographic (depth, original index) merge), but the face table is stored
ONCE per image as [num_blocks, CHUNK, D] -- faces grouped into fixed blocks
of CHUNK consecutive draw-order faces -- and each tile carries only a small
list of the block INDICES whose member bboxes overlap it.  The kernel uses
scalar prefetching (pltpu.PrefetchScalarGridSpec) so the face BlockSpec's
index_map reads the per-tile block list: grid step (b, t, c) DMAs block
`block_ids[b, t, c]` of the shared table.

This is the CSR-style two-pass binning the exact per-tile packing
(forward_pallas._pack_faces) cannot scale to: that path materialises
O(tiles x faces x row) gathered tables (2.4 GB at 4 x 512^2 x 65,536 faces
-- past HBM), while this one is O(faces x row) + O(tiles x num_blocks)
int32 lists.  The trade is block-granularity sweeping: a tile processes a
whole 64-face block when ANY member face's bbox overlaps it.  For meshes
with draw-order spatial coherence (any sane mesh export; the reference's
GL pipeline benefits from the same coherence in its hardware binning) the
extra face-visits are small; for a randomly-permuted face order every
block hits every tile and the sweep degrades towards brute force -- the
per-face-exact packing remains available as backend "dense".

Inactive grid steps (c >= n_blocks[tile]) repeat the previous block index
so consecutive steps hit the Pallas block-index cache and issue no DMA.

Replaces the role of GL triangle setup + raster binning at mesh scale
(csrc/rasterise_egl.cpp:362-380; the reference's envelope is 2^24 vertices,
csrc/rasterise_grad_egl.cpp:399-405).
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import forward_dense, forward_pallas, geometry, reference

TILE_H = int(_os.environ.get("DIRT_TPU_BLOCKS_TILE_H", 32))
TILE_W = int(_os.environ.get("DIRT_TPU_BLOCKS_TILE_W", 128))
CHUNK = int(_os.environ.get("DIRT_TPU_BLOCKS_CHUNK", 64))
_BASE = forward_pallas._BASE


def _cdiv(a, b):
    return -(-a // b)


def tile_block_cap(num_blocks):
    """Max face-block slots swept per tile (bounds grid steps, not memory:
    the block lists are int32).  0 or negative = uncapped (exact)."""
    cap = int(_os.environ.get("DIRT_TPU_TILE_BLOCK_CAP", "0"))
    if cap <= 0:
        return num_blocks
    return min(num_blocks, cap)


def block_bins(face_data, bbox_cols, num_blocks, num_chunks, chunk,
               tiles_y, tiles_x, tile_h, tile_w):
    """Per-tile hit lists at face-BLOCK granularity for one image.

    face_data: [num_blocks * chunk, D] with pixel bboxes (r0, r1, c0, c1) in
    columns `bbox_cols` (padded rows have empty bboxes).  A block hits a
    tile iff any member face's bbox overlaps it.

    Returns:
        block_ids: [T, num_chunks] int32, hitting block indices first (draw
            order), then the last hitting id repeated (so consecutive
            inactive grid steps re-use the resident block: no DMA).
        n_blocks: [T] int32, clamped to num_chunks.
    """
    r0c, r1c, c0c, c1c = bbox_cols
    tile_r0 = jnp.arange(tiles_y, dtype=jnp.int32) * tile_h
    tile_c0 = jnp.arange(tiles_x, dtype=jnp.int32) * tile_w
    hit_rows = ((face_data[None, :, r0c] <= (tile_r0 + tile_h - 1)[:, None])
                & (face_data[None, :, r1c] >= tile_r0[:, None]))
    hit_cols = ((face_data[None, :, c0c] <= (tile_c0 + tile_w - 1)[:, None])
                & (face_data[None, :, c1c] >= tile_c0[:, None]))
    overlap = (hit_rows[:, None, :] & hit_cols[None, :, :]).reshape(
        tiles_y * tiles_x, num_blocks, chunk)
    hit_blocks = jnp.any(overlap, axis=-1)                     # [T, NB]
    order = jnp.argsort(jnp.logical_not(hit_blocks), axis=1,
                        stable=True).astype(jnp.int32)         # [T, NB]
    n_blocks = jnp.sum(hit_blocks, axis=1).astype(jnp.int32)   # [T]
    n_blocks = jnp.minimum(n_blocks, num_chunks)

    order = order[:, :num_chunks]
    # Repeat the last hitting id over the inactive tail (id 0 when none hit).
    last = jnp.take_along_axis(
        order, jnp.maximum(n_blocks - 1, 0)[:, None], axis=1)  # [T, 1]
    active = (jnp.arange(num_chunks, dtype=jnp.int32)[None, :]
              < n_blocks[:, None])
    block_ids = jnp.where(active, order, last)
    return block_ids, n_blocks


def _raster_kernel(nblk_ref, blkids_ref, face_ref, state_ref,
                   *, height, width, channels, tiles_x):
    del blkids_ref  # consumed by the face BlockSpec's index_map
    pix = TILE_H * TILE_W
    ns = channels + 9
    batch_idx = pl.program_id(0)
    tile = pl.program_id(1)
    chunk_idx = pl.program_id(2)
    tile_row = (tile // tiles_x) * TILE_H
    tile_col = jax.lax.rem(tile, tiles_x) * TILE_W

    @pl.when(chunk_idx == 0)
    def _init():
        zeros = jnp.zeros((channels + 7, pix), jnp.float32)
        depth = jnp.full((1, pix), 1.0, jnp.float32)
        orig = jnp.full((1, pix), -1.0, jnp.float32)
        state_ref[0, 0] = jnp.concatenate([zeros, depth, orig], axis=0)

    chunk_active = chunk_idx < nblk_ref[batch_idx, tile]

    @pl.when(chunk_active)
    def _process():
        p = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
        rows = p // TILE_W
        cols = p - rows * TILE_W
        xg = (((tile_col + cols).astype(jnp.float32) + 0.5)
              * (2.0 / width) - 1.0)
        yg = (1.0 - ((tile_row + rows).astype(jnp.float32) + 0.5)
              * (2.0 / height))

        def col(i):
            return face_ref[0, 0, :, i:i + 1]               # [CHUNK, 1]

        E0 = col(0) * xg + col(1) * yg + col(2)
        E1 = col(3) * xg + col(4) * yg + col(5)
        E2 = col(6) * xg + col(7) * yg + col(8)

        s_z = E0 * col(9) + E1 * col(10) + E2 * col(11)
        s_w = E0 * col(12) + E1 * col(13) + E2 * col(14)
        a0 = col(15) != 0.0
        a1 = col(16) != 0.0
        a2 = col(17) != 0.0
        in_p = (((E0 > 0) | ((E0 == 0) & a0))
                & ((E1 > 0) | ((E1 == 0) & a1))
                & ((E2 > 0) | ((E2 == 0) & a2)))
        in_n = (((E0 < 0) | ((E0 == 0) & ~a0))
                & ((E1 < 0) | ((E1 == 0) & ~a1))
                & ((E2 < 0) | ((E2 == 0) & ~a2)))
        cov_p = in_p & (s_w > 0) & (s_z >= -s_w) & (s_z <= s_w)
        cov_n = in_n & (s_w < 0) & (s_z <= -s_w) & (s_z >= s_w)
        covered = (cov_p | cov_n) & (col(18) != 0.0)
        depth = jnp.where(covered, s_z / s_w, jnp.inf)

        orig_col = col(19)
        best_depth = jnp.min(depth, axis=0, keepdims=True)
        at_best = depth == best_depth
        big = jnp.float32(forward_pallas._BIG)
        best_orig = jnp.min(jnp.where(at_best, orig_col, big), axis=0,
                            keepdims=True)
        winner = at_best & (orig_col == best_orig)

        def pick(plane):
            return jnp.sum(jnp.where(winner, plane, 0.0), axis=0,
                           keepdims=True)

        cand_rows = [
            pick((E0 * col(_BASE + ch) + E1 * col(_BASE + channels + ch))
                 + E2 * col(_BASE + 2 * channels + ch))
            for ch in range(channels)
        ]
        cand_rows += [pick(E0), pick(E1), pick(E2), pick(s_w)]
        cand_rows += [pick(col(24 + k)) for k in range(3)]
        cand_rows += [best_depth, best_orig]
        cand = jnp.concatenate(cand_rows, axis=0)

        prev = state_ref[0, 0]
        chunk_cov = best_depth < jnp.inf
        prev_depth = prev[ns - 2:ns - 1, :]
        prev_orig = prev[ns - 1:ns, :]
        better = chunk_cov & (
            (best_depth < prev_depth)
            | ((best_depth == prev_depth) & (best_orig < prev_orig)))
        state_ref[0, 0] = jnp.where(better, cand, prev)


def rasterise_batch(background, vertices, vertex_colors, faces,
                    interpret=None):
    """Batched forward rasterisation via the block-binned dense kernel.

    Contract identical to forward_dense.rasterise_batch; visibility matches
    the other backends bit-exactly on tie-free scenes (the kernel math is
    the same expression tree; only which face slots a tile sweeps differs,
    and non-overlapping faces produce no coverage).
    """
    if interpret is None:
        from . import dispatch
        interpret = not dispatch.on_accelerator()

    from . import dispatch as _dispatch
    background, vertices, vertex_colors, faces = _dispatch.guard_constants(
        jnp.asarray(background, jnp.float32),
        jnp.asarray(vertices, jnp.float32),
        jnp.asarray(vertex_colors, jnp.float32),
        jnp.asarray(faces, jnp.int32))

    batch, height, width, channels = background.shape
    num_faces = faces.shape[1]
    if num_faces == 0:
        return jax.vmap(reference.shade_pixels)(
            jnp.full((batch, height, width), -1, jnp.int32),
            geometry.face_setup(vertices, faces), faces, vertex_colors,
            background)

    num_blocks = _cdiv(num_faces, CHUNK)
    num_chunks = max(1, tile_block_cap(num_blocks))
    tiles_y = _cdiv(height, TILE_H)
    tiles_x = _cdiv(width, TILE_W)
    num_tiles = tiles_y * tiles_x
    width_d = _BASE + 3 * channels
    pix = TILE_H * TILE_W
    ns = channels + 9

    def pack_one(v, c, f):
        face_data = forward_pallas._face_table(
            v, c, f, height, width, num_blocks * CHUNK - num_faces)
        block_ids, n_blocks = block_bins(
            face_data, (20, 21, 22, 23), num_blocks, num_chunks, CHUNK,
            tiles_y, tiles_x, TILE_H, TILE_W)
        return face_data.reshape(num_blocks, CHUNK, width_d), \
            block_ids, n_blocks

    face_table, block_ids, n_blocks = jax.vmap(pack_one)(
        vertices, vertex_colors, faces)

    kernel = functools.partial(
        _raster_kernel, height=height, width=width, channels=channels,
        tiles_x=tiles_x)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,      # n_blocks [B, T], block_ids [B, T, NCK]
        grid=(batch, num_tiles, num_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, CHUNK, width_d),
                         lambda b, t, c, nblk, ids: (b, ids[b, t, c], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ns, pix),
                               lambda b, t, c, nblk, ids: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    state = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_tiles, ns, pix), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(n_blocks, block_ids, face_table)

    return forward_dense.finalize(state, background, height, width,
                                  tiles_y, tiles_x,
                                  tile_h=TILE_H, tile_w=TILE_W)
