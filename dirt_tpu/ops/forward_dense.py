"""Dense single-pass Pallas TPU rasterisation kernel.

Same contract and fragment semantics as ops/forward_pallas.py (the fused
per-face kernel), with the per-face `fori_loop` replaced by DENSE vector
planes over a whole face chunk at once:

    E_i        [CHUNK, PIX] = a_i * x + b_i * y + c_i
    coverage   [CHUNK, PIX] (fill rule + per-fragment |Z| <= |W| clip)
    depth      [CHUNK, PIX] = S_z / S_w

followed by a lexicographic (depth, original index) reduction over the chunk
axis and a merge into per-pixel running state.  Visibility and shading fuse
into ONE sweep: the winner's interpolation numerators (computed with exactly
the same FMA structure as geometry.interpolate_attributes, so constant
attributes stay constant-preserving) and edge values ride the running state,
and a cheap XLA postprocess performs the single division, compositing and
aux assembly.

Rationale: the per-face kernel's hot loop issues ~30 scalar SMEM reads per
face and serialises on the scalar unit; the dense form has NO scalar reads
in the hot path -- face constants broadcast from VMEM columns [CHUNK, 1] --
and turns the face sweep into full-width VPU work on [CHUNK, PIX] planes
(PIX = TILE_H * TILE_W, flattened so every op sits on the native
sublane x lane layout).

Two work schedules share the chunk-sweep math (`chunk_candidates` /
`merge_state`, also used by ops/forward_blocks.py so the backends cannot
drift numerically):

  * FUSED (production, round 3): grid (batch, tiles); the tile's whole
    face table is resident in VMEM and an in-kernel fori_loop sweeps only
    the live chunks.  The round-3 device sweep measured ~2 us of fixed
    cost PER GRID STEP (shrinking tiles made everything slower), so
    folding the chunk dimension into the kernel removes both the dead
    chunk steps and ~7/8 of the step overhead.
  * chunk-grid (DIRT_TPU_DENSE_FUSED=0): grid (batch, tiles, chunks) with
    one face chunk streamed per step; kept selectable for comparison.

Reference semantics being replaced: GL triangle setup + raster units +
depth test + smooth interpolation (csrc/rasterise_egl.cpp:362-380,
csrc/shaders.cpp:16-43).
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import forward_pallas, geometry, reference

# 0 = auto (tile_shape); a non-zero env value pins the dimension.
TILE_H = int(_os.environ.get("DIRT_TPU_DENSE_TILE_H", 0))
TILE_W = int(_os.environ.get("DIRT_TPU_DENSE_TILE_W", 0))
CHUNK = int(_os.environ.get("DIRT_TPU_DENSE_CHUNK", 64))


def tile_shape(height, width):
    """Tile shape for the dense kernels.  The round-3 device sweep measured
    16x256 fastest at the bench config (3.98 ms vs 4.56 for 32x128: half
    the grid steps at the same 4096-pixel tile); images too narrow for a
    256-lane tile keep 32x128 (16x128 measured slower, 4.70 ms)."""
    del height
    tw = TILE_W or (256 if width > 128 else 128)
    th = TILE_H or (16 if tw >= 256 else 32)
    return th, tw
FUSED = _os.environ.get("DIRT_TPU_DENSE_FUSED", "1") != "0"
# Sweep slab height (0 = full-chunk sweep); see chunk_candidates.
SLAB = int(_os.environ.get("DIRT_TPU_SWEEP_SLAB", "0"))
# Coverage-test algebra: 1 = reduced-op boolean form (see _chunk_candidates;
# provably the same `covered` bits as the spec tree), 0 = the literal
# geometry.fragment_cover_depth expression tree.  Flag exists for the device
# A/B (sweeps/_sweep_cover.py); outputs are bitwise-identical either way.
COVER_FAST = _os.environ.get("DIRT_TPU_COVER_FAST", "1") != "0"
# (REMOVED, round 5: DIRT_TPU_SWEEP_FOLD -- a fill-rule zero fold
# ((E > 0) | ((E == 0) & a) as (where(E == 0, a ? 1 : -1, E) > 0)) and a
# winner-mask fold (key == best_orig alone, reusing the where(at_best,
# orig, BIG) plane).  Both bitwise-identical and 4 plane ops cheaper by
# count, but the device A/B LOST 2-5% at every size: Mosaic float selects
# with broadcast operands cost more than the boolean chains they replaced
# (sweeps/_sweep_fold.py, BASELINE.md round-5 section).)
_BASE = forward_pallas._BASE

# Packed per-pixel state rows (all float32; ints are exact below 2^24):
#   [0:C]  interpolation numerators      [C:C+3]  E0, E1, E2 of the winner
#   [C+3]  S_w of the winner             [C+4:C+7] winner vertex ids
#   [C+7]  depth (running z-buffer)      [C+8]    original face index (-1 bg)


def _cdiv(a, b):
    return -(-a // b)


def pixel_ndc(tile_row, tile_col, height, width, pix, tile_w):
    """Pixel-centre NDC rows for a flattened tile, identical expression to
    geometry.pixel_centre_ndc.  Returns (xg, yg), each [1, pix]."""
    p = jax.lax.broadcasted_iota(jnp.int32, (1, pix), 1)
    rows = p // tile_w
    cols = p - rows * tile_w
    xg = (((tile_col + cols).astype(jnp.float32) + 0.5)
          * (2.0 / width) - 1.0)
    yg = (1.0 - ((tile_row + rows).astype(jnp.float32) + 0.5)
          * (2.0 / height))
    return xg, yg


def init_state(channels, pix):
    """glClearDepth(1.0) equivalent; orig -1 marks background.  Value rows
    are junk until a face wins (the postprocess selects on orig >= 0)."""
    zeros = jnp.zeros((channels + 7, pix), jnp.float32)
    depth = jnp.full((1, pix), 1.0, jnp.float32)
    orig = jnp.full((1, pix), -1.0, jnp.float32)
    return jnp.concatenate([zeros, depth, orig], axis=0)


def chunk_candidates(col, xg, yg, channels):
    """One dense chunk sweep: edge functions, coverage, depth, and the
    lexicographic (depth, original index) winner pick over the chunk.

    `col(i)` returns face-table column i as [K, 1] (layout comment in
    ops/forward_pallas.py).  Returns (cand [C+9, pix], best_depth [1, pix],
    best_orig [1, pix]).  Shared by the dense, fused-dense and
    block-binned kernels so their per-fragment arithmetic is the same
    expression tree (the bit-exact-visibility invariant).

    With DIRT_TPU_SWEEP_SLAB=S (S >= 2 dividing the chunk), the chunk is
    swept in S-row slabs merged sequentially through `merge_state`.  The
    result is bitwise-identical to the full-chunk sweep: the winner pick
    is a lexicographic (depth, original index) MIN -- exactly associative
    -- and each pick() "sum" has exactly one non-zero row per pixel
    (within the winning slab it selects the same row value; a -0.0 winner
    row still normalises to +0.0 as long as S >= 2).  The point is
    register pressure: the full-chunk form keeps ~10 live [CHUNK, PIX]
    planes (~320 vregs at 64x512), far over the register file, so Mosaic
    spills intermediates to VMEM; S=8 slabs keep the live set at
    [8, PIX].
    """
    k = col(0).shape[0]
    s = SLAB
    if s >= 2 and k > s and k % s == 0:
        ns = channels + 9
        out = None
        for s0 in range(0, k, s):
            def scol(i, s0=s0):
                return col(i)[s0:s0 + s]
            cand, bd, bo = _chunk_candidates(scol, xg, yg, channels)
            out = (cand if out is None
                   else merge_state(out, cand, bd, bo, ns))
        return out, out[ns - 2:ns - 1, :], out[ns - 1:ns, :]
    return _chunk_candidates(col, xg, yg, channels)


def _chunk_candidates(col, xg, yg, channels):
    E0 = col(0) * xg + col(1) * yg + col(2)
    E1 = col(3) * xg + col(4) * yg + col(5)
    E2 = col(6) * xg + col(7) * yg + col(8)

    s_z = E0 * col(9) + E1 * col(10) + E2 * col(11)
    s_w = E0 * col(12) + E1 * col(13) + E2 * col(14)
    a0 = col(15) != 0.0
    a1 = col(16) != 0.0
    a2 = col(17) != 0.0
    if COVER_FAST:
        # Reduced-op boolean form of geometry.fragment_cover_depth's
        # coverage test (~24 [CHUNK, PIX] vector ops vs ~40 for the literal
        # tree; the fused sweep is VPU-issue-bound, BASELINE.md round 4).
        # ok_i is the spec's own positive fill-rule term; the savings are
        # the three rewrites below.  (A select form ok_i = where(a_i, E>=0,
        # E>0) would save 3 more ops but Mosaic cannot lower selects on
        # BOOLEAN planes — arith.trunci i8->i1 is unsupported on v5e.)
        # `covered` is bitwise-identical to the spec tree AND-ed with the
        # valid flag:
        #   * The sign-branch union folds into per-edge equality tests:
        #     with sp := (s_w > 0), covered_pre := all(ok_i == sp) & (s_w
        #     != 0).  Under s_w > 0 this is in_p.  Under s_w < 0 it is
        #     in_n: the negative-branch edge term (E_i < 0) | ((E_i == 0)
        #     & ~a_i) equals ~ok_i for non-NaN E_i (shared edges still
        #     rasterise once), and s_w non-NaN forces every E_i non-NaN
        #     (a NaN E_i makes s_w NaN — every s_w term carries an E
        #     factor, and 0 * NaN = NaN).  s_w == +/-0 fails the != 0
        #     gate exactly as both spec sign branches fail; NaN s_w
        #     passes != 0 but dies on the magnitude test below, matching
        #     the spec's false sign comparisons.
        #   * Under s_w > 0: (s_z >= -s_w) & (s_z <= s_w) <=> |s_z| <= s_w
        #     = |s_w|; under s_w < 0: (s_z <= -s_w) & (s_z >= s_w) <=>
        #     |s_z| <= -s_w = |s_w| (f32 abs is exact; NaN s_z fails all
        #     forms).  The shared magnitude test distributes out of the
        #     branch union because it is sign-independent.
        #   * The valid-flag AND (col 18) is dropped: invalid (degenerate)
        #     rows carry NaN z/w columns at pack time
        #     (forward_pallas._face_table) -- a degenerate face's rounded
        #     edge values CAN spuriously pass the fill rule, and the CSR
        #     block schedule sweeps invalid blockmates of live blocks --
        #     so s_z/s_w are NaN and the magnitude test kills coverage;
        #     all-zero pad rows die on s_w == 0.  The spec tree keeps the
        #     flag for the unbinned per-fragment path
        #     (geometry.fragment_cover_depth).
        sp = s_w > 0.0
        d0 = ((E0 > 0) | ((E0 == 0) & a0)) == sp
        d1 = ((E1 > 0) | ((E1 == 0) & a1)) == sp
        d2 = ((E2 > 0) | ((E2 == 0) & a2)) == sp
        covered = ((d0 & d1 & d2) & (s_w != 0.0)
                   & (jnp.abs(s_z) <= jnp.abs(s_w)))
    else:
        in_p = (((E0 > 0) | ((E0 == 0) & a0))
                & ((E1 > 0) | ((E1 == 0) & a1))
                & ((E2 > 0) | ((E2 == 0) & a2)))
        in_n = (((E0 < 0) | ((E0 == 0) & ~a0))
                & ((E1 < 0) | ((E1 == 0) & ~a1))
                & ((E2 < 0) | ((E2 == 0) & ~a2)))
        cov_p = in_p & (s_w > 0) & (s_z >= -s_w) & (s_z <= s_w)
        cov_n = in_n & (s_w < 0) & (s_z <= -s_w) & (s_z >= s_w)
        covered = (cov_p | cov_n) & (col(18) != 0.0)
    # Unmasked division as everywhere else (see geometry
    # fragment_cover_depth): the select discards inf/nan.
    depth = jnp.where(covered, s_z / s_w, jnp.inf)

    orig_col = col(19)                              # original face index
    # Lexicographic (depth, original index) minimum over the chunk.
    # Non-hitting tail slots produce no coverage (conservative bboxes),
    # so processing the full chunk is correct, only wasteful.
    best_depth = jnp.min(depth, axis=0, keepdims=True)       # [1, PIX]
    at_best = depth == best_depth                            # [K, PIX]
    big = jnp.float32(forward_pallas._BIG)
    best_orig = jnp.min(jnp.where(at_best, orig_col, big), axis=0,
                        keepdims=True)
    winner = at_best & (orig_col == best_orig)

    def pick(plane):
        return jnp.sum(jnp.where(winner, plane, 0.0), axis=0,
                       keepdims=True)

    # Winner rows.  num matches the FMA structure of
    # geometry.interpolate_attributes / the per-face kernel exactly:
    # ((E0*a0 + E1*a1) + E2*a2), so constant attributes interpolate to
    # themselves bit-exactly after the postprocess division.
    cand_rows = [
        pick((E0 * col(_BASE + ch) + E1 * col(_BASE + channels + ch))
             + E2 * col(_BASE + 2 * channels + ch))
        for ch in range(channels)
    ]
    cand_rows += [pick(E0), pick(E1), pick(E2), pick(s_w)]
    cand_rows += [pick(col(24 + k)) for k in range(3)]
    cand_rows += [best_depth, best_orig]
    return jnp.concatenate(cand_rows, axis=0), best_depth, best_orig


def merge_state(prev, cand, best_depth, best_orig, ns):
    """GL_LESS + draw-order-tie merge of a chunk's winner into the running
    per-pixel state."""
    chunk_cov = best_depth < jnp.inf
    prev_depth = prev[ns - 2:ns - 1, :]
    prev_orig = prev[ns - 1:ns, :]
    better = chunk_cov & (
        (best_depth < prev_depth)
        | ((best_depth == prev_depth) & (best_orig < prev_orig)))
    return jnp.where(better, cand, prev)


def _raster_kernel(count_ref, face_ref, state_ref,
                   *, height, width, channels, tiles_x, tile_h, tile_w):
    """Chunk-grid schedule: one face chunk per grid step."""
    pix = tile_h * tile_w
    ns = channels + 9
    chunk_idx = pl.program_id(2)
    tile = pl.program_id(1)
    tile_row = (tile // tiles_x) * tile_h
    tile_col = jax.lax.rem(tile, tiles_x) * tile_w

    @pl.when(chunk_idx == 0)
    def _init():
        state_ref[0, 0] = init_state(channels, pix)

    chunk_active = chunk_idx * CHUNK < count_ref[0, 0, 0, 0, 0]

    @pl.when(chunk_active)
    def _process():
        xg, yg = pixel_ndc(tile_row, tile_col, height, width, pix, tile_w)

        def col(i):
            return face_ref[0, 0, 0, :, i:i + 1]        # [CHUNK, 1]

        cand, best_depth, best_orig = chunk_candidates(col, xg, yg, channels)
        state_ref[0, 0] = merge_state(state_ref[0, 0], cand, best_depth,
                                      best_orig, ns)


def _raster_kernel_fused(count_ref, face_ref, state_ref,
                         *, height, width, channels, tiles_x, tile_h, tile_w):
    """Fused schedule: grid (batch, tiles); in-kernel loop over live chunks
    with the tile's whole face table resident in VMEM.  Dead chunks cost
    nothing (dynamic trip count), and the running state stays in vector
    registers across the sweep instead of a VMEM round trip per chunk."""
    pix = tile_h * tile_w
    ns = channels + 9
    tile = pl.program_id(1)
    tile_row = (tile // tiles_x) * tile_h
    tile_col = jax.lax.rem(tile, tiles_x) * tile_w
    xg, yg = pixel_ndc(tile_row, tile_col, height, width, pix, tile_w)

    def body(c, state):
        def col(i):
            return face_ref[0, 0, c, :, i:i + 1]        # [CHUNK, 1]
        cand, best_depth, best_orig = chunk_candidates(col, xg, yg, channels)
        return merge_state(state, cand, best_depth, best_orig, ns)

    count = count_ref[0, 0, 0, 0, 0]
    n_live = (count + (CHUNK - 1)) // CHUNK
    state_ref[0, 0] = jax.lax.fori_loop(
        0, n_live, body, init_state(channels, pix))


def rasterise_batch(background, vertices, vertex_colors, faces,
                    interpret=None):
    """Batched forward rasterisation via the dense single-pass kernel.

    Contract identical to forward_pallas.rasterise_batch: returns
    (pixels [B, H, W, C], reference.RasterAux); visibility matches the other
    backends bit-exactly on tie-free scenes, constant attributes
    interpolate exactly.
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

    num_chunks = max(1, _cdiv(forward_pallas.tile_face_cap(num_faces), CHUNK))
    tile_h, tile_w = tile_shape(height, width)
    tiles_y = _cdiv(height, tile_h)
    tiles_x = _cdiv(width, tile_w)
    num_tiles = tiles_y * tiles_x
    hp, wp = tiles_y * tile_h, tiles_x * tile_w
    width_d = _BASE + 3 * channels
    pix = tile_h * tile_w
    ns = channels + 9

    face_data, counts, dropped = jax.vmap(
        functools.partial(forward_pallas._pack_faces, height=height,
                          width=width, num_chunks=num_chunks,
                          tiles_y=tiles_y, tiles_x=tiles_x, chunk=CHUNK,
                          tile_h=tile_h, tile_w=tile_w))(
        vertices, vertex_colors, faces)

    if FUSED:
        kernel = functools.partial(
            _raster_kernel_fused, height=height, width=width,
            channels=channels, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w)
        state = pl.pallas_call(
            kernel,
            grid=(batch, num_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1, 1),
                             lambda b, t: (b, t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, num_chunks, CHUNK, width_d),
                             lambda b, t: (b, t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, ns, pix),
                                   lambda b, t: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, num_tiles, ns, pix), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            interpret=interpret,
        )(counts, face_data)
    else:
        kernel = functools.partial(
            _raster_kernel, height=height, width=width, channels=channels,
            tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w)
        state = pl.pallas_call(
            kernel,
            grid=(batch, num_tiles, num_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, 1, 1, 1),
                             lambda b, t, c: (b, t, 0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, 1, CHUNK, width_d),
                             lambda b, t, c: (b, t, c, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, ns, pix),
                                   lambda b, t, c: (b, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (batch, num_tiles, ns, pix), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            interpret=interpret,
        )(counts, face_data)

    pixels, aux = finalize(state, background, height, width, tiles_y,
                           tiles_x, tile_h=tile_h, tile_w=tile_w)
    return pixels, aux._replace(dropped=dropped)


def finalize(state, background, height, width, tiles_y, tiles_x,
             *, tile_h, tile_w):
    """Un-tiles the packed per-pixel state and runs the XLA postprocess
    (one division, composite, aux assembly -- elementwise at pixel count,
    no gathers).  Shared by the dense and block-binned kernels."""
    batch, _, _, channels = background.shape
    ns = channels + 9
    hp, wp = tiles_y * tile_h, tiles_x * tile_w

    # Un-tile: [B, T, NS, PIX] -> [B, H, W, NS] (one transposing copy).
    state = state.reshape(batch, tiles_y, tiles_x, ns, tile_h, tile_w)
    state = state.transpose(0, 1, 4, 2, 5, 3).reshape(batch, hp, wp, ns)
    state = state[:, :height, :width]

    num = state[..., :channels]
    e01 = state[..., channels:channels + 3]
    sw = state[..., channels + 3]
    vid = state[..., channels + 4:channels + 7]
    orig = state[..., channels + 8].astype(jnp.int32)

    covered = orig >= 0
    den = (e01[..., 0] + e01[..., 1]) + e01[..., 2]
    safe_den = jnp.where(den == 0, 1.0, den)
    pixels = jnp.where(covered[..., None], num / safe_den[..., None],
                       background)
    bary = jnp.where(covered[..., None], e01 / safe_den[..., None], -1.0)
    clip_w = jnp.where(covered, sw / safe_den, jnp.inf)
    indices = jnp.where(covered[..., None], vid.astype(jnp.int32), -1)

    aux = reference.RasterAux(
        face_index=orig, indices=indices, barycentric=bary, clip_w=clip_w)
    return pixels, aux
