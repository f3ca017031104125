"""Fused tile-binned Pallas TPU rasterisation kernel (visibility + shading).

This is the TPU-native replacement for the role OpenGL hardware plays in the
reference (triangle setup + raster units + depth test + attribute
interpolation, csrc/rasterise_egl.cpp:362-380, csrc/shaders.cpp:16-43): one
`pl.pallas_call` over a (batch, tile_row, tile_col, 2 * face_chunk) grid.

Phase 1 (first num_chunks steps per tile): z-buffered visibility.  Faces are
binned into exact per-tile lists (stable hits-first ordering + a hit count),
so each tile sweeps only its own faces; the z-buffer rides fori_loop carries
in vector registers.  Depth ties resolve to the smallest *original* face
index (GL draw order).

Phase 2 (second num_chunks steps): face-major shading.  Each face blends its
perspective-correct interpolated attributes into the pixel tile wherever the
winner map points at it, and writes the aux buffers (barycentrics, clip-w,
vertex-index triple) the backward pass consumes.  Corner attributes ride in
the per-face SMEM table (pre-gathered in XLA at face count, not pixel count),
so the hot path performs NO pixel-indexed gathers -- an XLA gather-based
shading postprocess measured ~10x slower on TPU v5e.

The framebuffer-atlas bookkeeping of the reference (rasterise_egl.cpp:326-334)
is replaced by the grid's batch dimension.
"""

import functools
import os as _os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import geometry, reference

TILE_H = int(_os.environ.get("DIRT_TPU_TILE_H", 32))
TILE_W = int(_os.environ.get("DIRT_TPU_TILE_W", 128))
CHUNK = int(_os.environ.get("DIRT_TPU_CHUNK", 512))   # faces per grid step
_BASE = 27           # packed floats per face before corner attributes
_BIG = np.int32(1 << 30)

# Face-table layout (see _pack_faces):
#   [0:9]   edge coefficients e (row-major 3x3)
#   [9:12]  corner clip z        [12:15] corner clip w
#   [15:18] fill-rule accept     [18]    valid flag
#   [19]    original face index  [20:24] pixel bbox (r0, r1, c0, c1)
#   [24:27] corner vertex ids    [27:27+3C] corner attributes (per corner:
#                                corner0[0..C), corner1[0..C), corner2[0..C))
# floats encode ints exactly below 2^24 -- the same vertex-count bound the
# reference's float-encoded index textures impose (rasterise_grad_egl.cpp:399).


def _cdiv(a, b):
    return -(-a // b)


def _face_table(vertices, vertex_colors, faces, height, width, pad_rows):
    """Per-face raster constants + corner attributes for one image (layout
    comment above): face_data [F + pad_rows, _BASE + 3C] float32, with the
    conservative pixel bbox in columns 20-23 and padded rows given an empty
    bbox so no binning scheme ever selects them."""
    num_faces = faces.shape[0]
    channels = vertex_colors.shape[-1]
    setup = geometry.face_setup(vertices, faces)

    corners = jnp.take(vertices, faces, axis=0)          # [F, 3, 4]
    w = corners[..., 3]
    safe_w = jnp.where(w > 0, w, 1.0)
    px = (corners[..., 0] / safe_w + 1.0) * (width / 2.0)
    py = (1.0 - corners[..., 1] / safe_w) * (height / 2.0)

    # Conservative pixel bbox (+/- 1 pixel of rounding slack); faces with any
    # w <= 0 may wrap through infinity, so they get the full screen.
    # Assumption: clip coordinates of moderate magnitude (|x|, |y|, |w| well
    # below ~2^20).  For extreme magnitudes, cancellation in the cross-product
    # edge coefficients could shift edge-function coverage beyond the slack
    # and a binned tile could miss fragments the unbinned reference backend
    # rasterises; such scenes are far outside the reference's envelope too
    # (GL rasteriser precision degrades the same way).
    unbounded = jnp.any(w <= 0, axis=-1)
    col0 = jnp.floor(jnp.min(px, axis=-1) - 0.5).astype(jnp.int32) - 1
    col1 = jnp.ceil(jnp.max(px, axis=-1) - 0.5).astype(jnp.int32) + 1
    row0 = jnp.floor(jnp.min(py, axis=-1) - 0.5).astype(jnp.int32) - 1
    row1 = jnp.ceil(jnp.max(py, axis=-1) - 0.5).astype(jnp.int32) + 1
    col0 = jnp.where(unbounded, 0, jnp.clip(col0, 0, width - 1))
    col1 = jnp.where(unbounded, width - 1, jnp.clip(col1, 0, width - 1))
    row0 = jnp.where(unbounded, 0, jnp.clip(row0, 0, height - 1))
    row1 = jnp.where(unbounded, height - 1, jnp.clip(row1, 0, height - 1))

    # Degenerate faces rasterise nothing: empty bbox keeps them out of the
    # chunk bboxes (the kernel also checks the valid flag).
    valid = setup.valid
    row0 = jnp.where(valid, row0, _BIG)
    col0 = jnp.where(valid, col0, _BIG)
    row1 = jnp.where(valid, row1, -1)
    col1 = jnp.where(valid, col1, -1)

    corner_attrs = jnp.take(vertex_colors, faces, axis=0)  # [F, 3, C]

    # Invalid (degenerate) rows additionally get NaN z/w columns: the CSR
    # block schedule sweeps EVERY row of a block whose union bbox hits a
    # tile, including invalid blockmates, and a degenerate face's rounded
    # edge values can spuriously pass the fill rule.  NaN z/w forces
    # s_z/s_w NaN so the per-fragment |s_z| <= |s_w| test kills coverage
    # in both coverage trees -- this is what lets COVER_FAST drop the
    # valid-flag AND from the hot sweep (forward_dense._chunk_candidates).
    keep = valid[:, None]
    f32 = lambda a: a.astype(jnp.float32)
    face_data = jnp.concatenate([
        setup.e.reshape(num_faces, 9),
        jnp.where(keep, setup.z, jnp.nan),
        jnp.where(keep, setup.w, jnp.nan),
        f32(setup.accept),
        f32(valid)[:, None],
        f32(jnp.arange(num_faces, dtype=jnp.int32))[:, None],
        f32(row0)[:, None], f32(row1)[:, None],
        f32(col0)[:, None], f32(col1)[:, None],
        f32(faces),
        corner_attrs.reshape(num_faces, 3 * channels),
    ], axis=1)

    face_data = jnp.concatenate(
        [face_data, jnp.tile(_pad_row(_BASE + 3 * channels)[None],
                             (pad_rows, 1))], axis=0)
    return face_data


def _pad_row(width_d):
    """A face-table row that no binning scheme selects and no kernel
    rasterises: zero everywhere (invalid flag) with an empty pixel bbox."""
    return jnp.zeros((width_d,), jnp.float32).at[20].set(
        float(_BIG)).at[22].set(float(_BIG)).at[21].set(-1.0).at[23].set(-1.0)


def _pack_faces(vertices, vertex_colors, faces, height, width, num_chunks,
                tiles_y, tiles_x, chunk=None, tile_h=None, tile_w=None):
    """Packs the face table for one image, binned into exact per-tile face
    lists.

    Every tile gets its own copy of the face table, stably ordered with the
    faces whose bounding boxes hit the tile FIRST; the kernel then only
    sweeps `ceil(count / CHUNK)` chunks per tile (the per-tile prefix), which
    measured ~4x fewer face visits than chunk-level bbox skipping on the
    benchmark scene.  Memory is O(tiles * faces); for large meshes use the
    block-binned packing (ops/forward_blocks.py), which shares _face_table.

    `chunk`/`tile_h`/`tile_w` default to this module's configuration; the
    dense kernel (ops/forward_dense.py) shares the packing with its own.

    Returns:
        face_data: [T, num_chunks, CHUNK, _BASE + 3 * C] float32.
        counts: [T, 1, 1, 1] int32 -- hit count per tile.
        dropped: [] int32 -- face visits beyond the per-tile cap, summed
            over tiles (0 when the packing is exact; see RasterAux.dropped).
    """
    CHUNK = chunk if chunk is not None else globals()["CHUNK"]
    TILE_H = tile_h if tile_h is not None else globals()["TILE_H"]
    TILE_W = tile_w if tile_w is not None else globals()["TILE_W"]
    num_faces = faces.shape[0]
    channels = vertex_colors.shape[-1]
    width_d = _BASE + 3 * channels
    # Pad so the binning covers every face AND the per-tile slice below has
    # enough rows (num_chunks may reflect the tile face cap < num_faces).
    pad_rows = max(num_chunks * CHUNK, num_faces) - num_faces
    face_data = _face_table(vertices, vertex_colors, faces, height, width,
                            pad_rows)

    # Exact per-tile binning: stable hits-first ordering per tile.  Padded
    # rows have empty bboxes and never hit.
    tile_r0 = (jnp.arange(tiles_y, dtype=jnp.int32) * TILE_H)
    tile_c0 = (jnp.arange(tiles_x, dtype=jnp.int32) * TILE_W)
    hit_rows = ((face_data[None, :, 20] <= (tile_r0 + TILE_H - 1)[:, None])
                & (face_data[None, :, 21] >= tile_r0[:, None]))   # [Ty, NCK]
    hit_cols = ((face_data[None, :, 22] <= (tile_c0 + TILE_W - 1)[:, None])
                & (face_data[None, :, 23] >= tile_c0[:, None]))   # [Tx, NCK]
    overlap = (hit_rows[:, None, :] & hit_cols[None, :, :]).reshape(
        tiles_y * tiles_x, -1)                                    # [T, NCK]

    # Per-tile face cap: only the first num_chunks * CHUNK hitting faces are
    # materialised per tile (hits-first order keeps the earliest-drawn).
    # For num_faces below the cap this is exact; see tile_face_cap().
    # Sort-free alternatives to the stable argsort were measured on v5e
    # (round 3) and LOST: cumsum-rank + searchsorted 'compare_all' 2541 f/s
    # headline (the [T, rows, NCK] compare intermediate hits HBM) and
    # 'scan' 672 f/s (serial per-query binary search) vs argsort 2631.
    max_rows = num_chunks * CHUNK
    order = jnp.argsort(jnp.logical_not(overlap), axis=1, stable=True)
    counts = jnp.sum(overlap, axis=1).astype(jnp.int32)           # [T]
    tiled = jnp.take(face_data, order[:, :max_rows], axis=0)
    dropped = jnp.sum(jnp.maximum(counts - max_rows, 0))
    counts = jnp.minimum(counts, max_rows)
    tiled = tiled.reshape(tiles_y * tiles_x, num_chunks, CHUNK, width_d)
    return tiled, counts[:, None, None, None], dropped


def tile_face_cap(num_faces):
    """Number of face slots materialised per tile.

    Exact per-tile binning replicates the face table per tile
    (O(tiles x faces x row) memory).  Beyond DIRT_TPU_TILE_FACE_CAP faces
    (default 8192) each tile keeps only its first `cap` hitting faces in
    draw order -- the reference has an analogous hard envelope (2^24
    vertices, csrc/rasterise_grad_egl.cpp:399-405).  A tile with more than
    `cap` OVERLAPPING faces would drop the latest-drawn ones; at that
    density the dropped faces are almost surely occluded, but raise the cap
    (or the tile size) if exactness at extreme densities matters.
    """
    cap = int(_os.environ.get("DIRT_TPU_TILE_FACE_CAP", "8192"))
    if cap <= 0:
        return num_faces
    return min(num_faces, cap)


def _raster_kernel(count_ref, face_ref, background_ref,
                   pixels_ref, aux_ref, depth_ref, winner_ref, orig_ref,
                   *, height, width, num_chunks, channels, tiles_x):
    step = pl.program_id(2)
    phase2 = step >= num_chunks
    chunk_idx = jax.lax.rem(step, num_chunks)
    tile = pl.program_id(1)
    tile_row = (tile // tiles_x) * TILE_H
    tile_col = jax.lax.rem(tile, tiles_x) * TILE_W

    @pl.when(step == 0)
    def _init_visibility():
        # glClearDepth(1.0) equivalent; winner -1 marks background.
        depth_ref[0] = jnp.full((TILE_H, TILE_W), 1.0, jnp.float32)
        winner_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
        orig_ref[0] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

    @pl.when(step == num_chunks)
    def _init_shading():
        pixels_ref[0] = background_ref[0]
        neg = jnp.full((TILE_H, TILE_W, 1), -1.0, jnp.float32)
        inf = jnp.full((TILE_H, TILE_W, 1), jnp.inf, jnp.float32)
        # (bary0..2, clip_w, vid0..2, orig): background clear values match the
        # reference's aux clears (rasterise_grad_egl.cpp:442-445).
        aux_ref[0] = jnp.concatenate(
            [neg, neg, neg, inf, neg, neg, neg, neg], axis=-1)

    # Exact binning: this tile's list holds its hitting faces first; chunks
    # past ceil(count / CHUNK) contain only non-hitting faces.
    chunk_active = chunk_idx * CHUNK < count_ref[0, 0, 0, 0, 0]

    @pl.when(chunk_active)
    def _process_chunk():
        rows = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W), 1)
        # Pixel-centre NDC, identical expression to geometry.pixel_centre_ndc.
        xg = ((tile_col + cols).astype(jnp.float32) + 0.5) * (2.0 / width) - 1.0
        yg = 1.0 - ((tile_row + rows).astype(jnp.float32) + 0.5) * (2.0 / height)

        def edges(j):
            E0 = (face_ref[0, 0, 0, j, 0] * xg + face_ref[0, 0, 0, j, 1] * yg
                  + face_ref[0, 0, 0, j, 2])
            E1 = (face_ref[0, 0, 0, j, 3] * xg + face_ref[0, 0, 0, j, 4] * yg
                  + face_ref[0, 0, 0, j, 5])
            E2 = (face_ref[0, 0, 0, j, 6] * xg + face_ref[0, 0, 0, j, 7] * yg
                  + face_ref[0, 0, 0, j, 8])
            return E0, E1, E2

        # The z-buffer / framebuffer state rides in fori_loop CARRIES, not in
        # the output refs: a ref read-modify-write per face costs several
        # full-tile VMEM round trips (measured ~40x slowdown); carries stay
        # in vector registers across the face loop and the refs are written
        # once per grid step.

        def visibility_face(j, state):
            best_depth, best_orig, best_winner = state
            E0, E1, E2 = edges(j)
            s_z = (E0 * face_ref[0, 0, 0, j, 9] + E1 * face_ref[0, 0, 0, j, 10]
                   + E2 * face_ref[0, 0, 0, j, 11])
            s_w = (E0 * face_ref[0, 0, 0, j, 12] + E1 * face_ref[0, 0, 0, j, 13]
                   + E2 * face_ref[0, 0, 0, j, 14])
            a0 = face_ref[0, 0, 0, j, 15] != 0.0
            a1 = face_ref[0, 0, 0, j, 16] != 0.0
            a2 = face_ref[0, 0, 0, j, 17] != 0.0
            in_p = (((E0 > 0) | ((E0 == 0) & a0))
                    & ((E1 > 0) | ((E1 == 0) & a1))
                    & ((E2 > 0) | ((E2 == 0) & a2)))
            in_n = (((E0 < 0) | ((E0 == 0) & ~a0))
                    & ((E1 < 0) | ((E1 == 0) & ~a1))
                    & ((E2 < 0) | ((E2 == 0) & ~a2)))
            cov_p = in_p & (s_w > 0) & (s_z >= -s_w) & (s_z <= s_w)
            cov_n = in_n & (s_w < 0) & (s_z <= -s_w) & (s_z >= s_w)
            covered = (cov_p | cov_n) & (face_ref[0, 0, 0, j, 18] != 0.0)
            # Non-hitting faces in a chunk's tail evaluate to no coverage
            # anyway; a lax.cond branch around them measured SLOWER (the cond
            # forces the carried tile registers through branch merges).
            depth = jnp.where(covered, s_z / s_w, jnp.inf)

            orig_index = face_ref[0, 0, 0, j, 19].astype(jnp.int32)
            # GL_LESS + draw-order ties == lexicographic (depth, index).
            better = covered & (
                (depth < best_depth)
                | ((depth == best_depth) & (orig_index < best_orig)))
            return (jnp.where(better, depth, best_depth),
                    jnp.where(better, orig_index, best_orig),
                    jnp.where(better, chunk_idx * CHUNK + j, best_winner))

        def shading_face(j, state):
            pix, aux = state
            mask = winner_ref[0] == chunk_idx * CHUNK + j
            E0, E1, E2 = edges(j)
            s_e = (E0 + E1) + E2
            denom = jnp.where(s_e == 0, 1.0, s_e)
            s_w = (E0 * face_ref[0, 0, 0, j, 12] + E1 * face_ref[0, 0, 0, j, 13]
                   + E2 * face_ref[0, 0, 0, j, 14])

            pix_planes = []
            for ch in range(channels):
                num = ((E0 * face_ref[0, 0, 0, j, _BASE + ch]
                        + E1 * face_ref[0, 0, 0, j, _BASE + channels + ch])
                       + E2 * face_ref[0, 0, 0, j, _BASE + 2 * channels + ch])
                pix_planes.append(jnp.where(mask, num / denom, pix[ch]))

            aux_planes = [
                jnp.where(mask, E0 / denom, aux[0]),
                jnp.where(mask, E1 / denom, aux[1]),
                jnp.where(mask, E2 / denom, aux[2]),
                jnp.where(mask, s_w / denom, aux[3]),
                jnp.where(mask, face_ref[0, 0, 0, j, 24], aux[4]),
                jnp.where(mask, face_ref[0, 0, 0, j, 25], aux[5]),
                jnp.where(mask, face_ref[0, 0, 0, j, 26], aux[6]),
                jnp.where(mask, face_ref[0, 0, 0, j, 19], aux[7]),
            ]
            return tuple(pix_planes), tuple(aux_planes)

        # Hits-first ordering makes the live region a prefix: loop only the
        # faces that actually hit this tile (dynamic trip count).
        n_live = jnp.minimum(
            CHUNK, count_ref[0, 0, 0, 0, 0] - chunk_idx * CHUNK)

        def run_visibility():
            state = (depth_ref[0], orig_ref[0], winner_ref[0])
            state = jax.lax.fori_loop(0, n_live, visibility_face, state)
            depth_ref[0], orig_ref[0], winner_ref[0] = state

        def run_shading():
            pix = tuple(pixels_ref[0, :, :, ch] for ch in range(channels))
            aux = tuple(aux_ref[0, :, :, k] for k in range(8))
            pix, aux = jax.lax.fori_loop(
                0, n_live, shading_face, (pix, aux))
            for ch in range(channels):
                pixels_ref[0, :, :, ch] = pix[ch]
            for k in range(8):
                aux_ref[0, :, :, k] = aux[k]

        jax.lax.cond(phase2, run_shading, run_visibility)


def rasterise_batch(background, vertices, vertex_colors, faces,
                    interpret=None):
    """Batched forward rasterisation via the fused Pallas kernel.

    Same contract as ops/reference.rasterise_batch: returns
    (pixels [B, H, W, C], RasterAux).  Pixel values may differ from the
    reference backend by float rounding (different compilers contract FMAs
    differently), but visibility (winning-face maps) matches bit-exactly on
    tie-free scenes, and constant attributes interpolate exactly (the square
    test's requirement) because numerator and denominator share the same
    edge values and summation order.
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
        pixels0, aux0 = jax.vmap(reference.shade_pixels)(
            jnp.full((batch, height, width), -1, jnp.int32),
            geometry.face_setup(vertices, faces), faces, vertex_colors,
            background)
        return pixels0, aux0._replace(
            dropped=jnp.zeros((batch,), jnp.int32))

    num_chunks = max(1, _cdiv(tile_face_cap(num_faces), CHUNK))
    tiles_y = _cdiv(height, TILE_H)
    tiles_x = _cdiv(width, TILE_W)
    hp, wp = tiles_y * TILE_H, tiles_x * TILE_W
    width_d = _BASE + 3 * channels

    face_data, counts, dropped = jax.vmap(
        functools.partial(_pack_faces, height=height, width=width,
                          num_chunks=num_chunks, tiles_y=tiles_y,
                          tiles_x=tiles_x))(
        vertices, vertex_colors, faces)

    background_p = jnp.pad(
        background, ((0, 0), (0, hp - height), (0, wp - width), (0, 0)))

    kernel = functools.partial(
        _raster_kernel, height=height, width=width, num_chunks=num_chunks,
        channels=channels, tiles_x=tiles_x)

    pix_spec = lambda last: pl.BlockSpec(
        (1, TILE_H, TILE_W) + (() if last is None else (last,)),
        (lambda b, t, c: (b, t // tiles_x, t % tiles_x))
        if last is None else
        (lambda b, t, c: (b, t // tiles_x, t % tiles_x, 0)),
        memory_space=pltpu.VMEM)

    grid = (batch, tiles_y * tiles_x, 2 * num_chunks)
    pixels, aux8, _, _, _ = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1, 1),
                         lambda b, t, c: (b, t, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1, CHUNK, width_d),
                         lambda b, t, c: (b, t, c % num_chunks, 0, 0),
                         memory_space=pltpu.SMEM),
            pix_spec(channels),
        ],
        out_specs=[
            pix_spec(channels),
            pix_spec(8),
            pix_spec(None),
            pix_spec(None),
            pix_spec(None),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((batch, hp, wp, channels), jnp.float32),
            jax.ShapeDtypeStruct((batch, hp, wp, 8), jnp.float32),
            jax.ShapeDtypeStruct((batch, hp, wp), jnp.float32),   # depth
            jax.ShapeDtypeStruct((batch, hp, wp), jnp.int32),     # winner pos
            jax.ShapeDtypeStruct((batch, hp, wp), jnp.int32),     # orig idx
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(counts, face_data, background_p)

    pixels = pixels[:, :height, :width]
    aux8 = aux8[:, :height, :width]
    aux = reference.RasterAux(
        face_index=aux8[..., 7].astype(jnp.int32),
        indices=aux8[..., 4:7].astype(jnp.int32),
        barycentric=aux8[..., 0:3],
        clip_w=aux8[..., 3],
        dropped=dropped,
    )
    return pixels, aux
