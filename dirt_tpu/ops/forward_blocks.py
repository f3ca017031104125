"""Block-binned (CSR) dense Pallas TPU rasterisation kernel: large meshes.

Same kernel math as ops/forward_dense.py (dense [CHUNK, PIX] vector planes,
lexicographic (depth, original index) merge), with a different work
schedule built for meshes whose exact per-tile face tables no longer fit:

  * Faces are grouped into BLOCKS of CHUNK consecutive draw-order faces and
    the face table is stored ONCE per image as [num_blocks, CHUNK, D] --
    O(faces) memory, vs the O(tiles x faces) gathered per-tile copies of
    forward_pallas._pack_faces (2.4 GB at 4 x 512^2 x 65,536 faces).
  * An XLA pre-pass builds a CSR-style SLOT LIST: one grid step per actual
    (tile, block) bbox overlap, grouped by tile, plus one mandatory slot
    per tile so every state block gets initialised.  Three flat int32
    arrays (slot -> batch*tile, slot -> block or -1 for no-op slots,
    slot -> DMA target) ride in SMEM via pltpu.PrefetchScalarGridSpec and
    drive the face BlockSpec's index_map.
    The grid is 1-D over slots: no face-cap truncation, no idle sweep
    steps, and SMEM scales with the hit count, not tiles x blocks.
    (Earlier shapes of this kernel hit both walls: per-tile dense id lists
    pad their trailing dim to 128 lanes and overflow the ~1 MB SMEM, and
    growing CHUNK to compensate overflows scoped VMEM at 26 MB -- the
    [CHUNK, PIX] planes scale with the block size.)
  * Filler slots repeat the previous slot's tile and carry block -1: same
    output block (resident, no writeback), no face DMA, no compute.

The trade is block-granularity sweeping: a tile processes a whole
CHUNK-face block when ANY member face's bbox overlaps it.  For meshes with
draw-order spatial coherence (any sane mesh export) the extra face-visits
are small; a randomly-permuted face order degrades towards brute force --
DIRT_TPU_SPATIAL_SORT=1 restores coherence for ANY draw order by Morton-
sorting the face table before blocking (bit-exact forward output; see
spatial_order), and the per-face-exact packing remains available as
backend "dense".

The slot list length is static: min(tiles x blocks, max(512, tiles +
8 x max(tiles, blocks))) per image, overridable with
DIRT_TPU_SLOTS_PER_IMAGE.  A scene needing more slots (pathologically
incoherent draw order) drops the later tiles' overflow hits -- the count
of dropped slots is surfaced per image as RasterAux.dropped (never
silent); raise the env var for exactness there.

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

# 0 = auto (tile_h_for / chunk_for); a non-zero env value pins it.
TILE_H = int(_os.environ.get("DIRT_TPU_BLOCKS_TILE_H", 0))
TILE_W = int(_os.environ.get("DIRT_TPU_BLOCKS_TILE_W", 128))
CHUNK = int(_os.environ.get("DIRT_TPU_BLOCKS_CHUNK", 0))
# Fused-CSR schedule: grid (batch * tile-groups), in-kernel loop over
# each tile's live face-block visits with depth-slot rotating manual DMA
# -- no filler grid steps and no per-slot state round trips (the z-state
# rides the fori_loop carry in vector registers, as in forward_dense
# FUSED).  See GROUP / DEPTH below.
FUSED = _os.environ.get("DIRT_TPU_BLOCKS_FUSED", "1") != "0"
# Spatial (Morton-order) face re-blocking: permute the face table so that
# blocks group spatially-adjacent faces instead of draw-order runs, which
# removes the "draw-order-incoherent meshes degrade towards brute force"
# caveat of block-granularity binning.  Bit-exact for the forward: the
# winner pick is a lexicographic (depth, original index) minimum over the
# swept candidates (forward_dense.chunk_candidates), which is independent
# of sweep order and partitioning, and the table rows carry their original
# indices.  Gradient values can shift by segment-sum summation order only.
# Default ON since the round-3 device A/B: neutral on coherent draw orders
# (4.94 vs 4.96 ms at the bench config), 1.4-1.5x on permuted ones, and a
# CORRECTNESS fix at 8192 permuted faces, where the unsorted schedule
# overflows the slot budget (1149 dropped slots -> 225 wrong pixels) while
# the sorted one drops nothing and matches the reference backend exactly.
SPATIAL = _os.environ.get("DIRT_TPU_SPATIAL_SORT", "1") != "0"
# Exact half-plane tile culling in the binning pre-pass (_edge_keep):
# refines the bbox hit test so thin/diagonal faces stop visiting the empty
# corners of their bboxes.  Conservative by an 8-ulp edge-function margin.
EDGE_CULL = _os.environ.get("DIRT_TPU_EDGE_CULL", "1") != "0"
# Pallas hit-matrix kernel: the round-5 stage split leaves the CSR packs
# as the largest non-exhausted step cost (fwd pack 0.33 ms of a 3.91 ms
# step), and the per-(tile, face) bbox + half-plane test fragments into
# ~30 XLA fusions of tiny [T, F] planes (sweeps/_probe_pack.py: +0.305 ms
# for the forward hit stage alone).  One Pallas kernel computes the whole
# keep plane per image.  Correctness does not require bitwise hit
# equality: the schedule only chooses which faces are SWEPT -- winners
# are a sweep-set-independent lexicographic minimum and gradient rows of
# unswept/extra faces reduce exact zeros -- and the 8-ulp margin makes
# the cull conservative under any FMA contraction choice.  (In practice
# the kernel mirrors the XLA expression tree and matches it bitwise on
# device -- sweeps/_sweep_hitk.py.)
HIT_PALLAS = _os.environ.get("DIRT_TPU_HIT_PALLAS", "1") != "0"
# The kernel keeps the whole [T, F] keep plane VMEM-resident, with a
# live set of ~8 same-shape edge-test intermediates (measured 33.75 MB
# scoped at 16x256^2x8192f, i.e. ~8x the 4 MB keep plane); past this
# keep-plane budget the XLA path takes over (where the pack is a
# vanishing share of the step anyway -- the large-mesh regime is
# sweep-bound, BASELINE.md).  8 MB + the kernel's 64 MB scoped limit
# covers every production config through 16x256^2x8192f; 512^2 x
# 65,536 faces ([512, 65536] = 134 MB) falls back.
HIT_PALLAS_BYTES = int(float(_os.environ.get(
    "DIRT_TPU_HIT_PALLAS_MB", "8")) * 1024 * 1024)
# (REMOVED, round 4: per-visit sub-chunk range clipping, DIRT_TPU_SUBCLIP.
# The device A/B -- sweeps/_sweep_subclip.py, table in BASELINE.md -- lost
# at every size: fwd 2.6->3.35 ms at 512 faces, 7.2->11.33 at 2048; the
# dynamic fori bounds + [SUB, PIX] sliced sweeps cost more than the ~28%
# lane saving available (sweeps/_probe_visits.py), and the gradient
# variant additionally broke the fused/slot bitwise invariant.)
# Tiles per fused grid step (0 = auto).  Grouping amortises the ~1 us
# Pallas per-grid-step fixed cost -- the dominant forward overhead at the
# bench config (2048 one-tile steps vs ~900 visits) -- over `group` tiles
# without widening any sweep; bit-exact vs the ungrouped schedule.
GROUP = int(_os.environ.get("DIRT_TPU_BLOCKS_GROUP", "0"))
# Rotating DMA scratch slots for the fused schedule (0 = auto).  depth-1
# face-block transfers stay in flight; 2 = the round-3 double buffer,
# which leaves the sweep DMA-latency-bound in the dense-face regime
# (~2.7 us/visit at 8192 faces vs ~0.6 us of compute).
DEPTH = int(_os.environ.get("DIRT_TPU_BLOCKS_DEPTH", "0"))
# Resident face-table mode for the fused schedule: when the per-image
# (lane-padded) table fits this VMEM budget, it rides a per-image VMEM
# BlockSpec (one pipeline fetch per image, amortised over the image's
# tile-group steps) and each visit reads its face block by dynamic index
# -- no per-visit DMA start/semaphore wait.  Value in MB; -1 = never,
# 0 = auto (12 MB: double-buffered 24 MB under the 64 MB scoped limit).
# Default NEVER: the device A/B (BASELINE.md "Round-4 resident VMEM
# table A/B") measured neutral at 512 faces and a ~3% LOSS at scale --
# the dynamic block-index address math costs more than the depth-4
# pipeline's already-hidden DMA.  Kept as the measured proof that the
# forward is VPU-issue-bound, not transport-bound (and for re-testing
# fine chunks without per-visit DMA-start cost).
RESIDENT_MB = float(_os.environ.get("DIRT_TPU_BLOCKS_RESIDENT_MB", "-1"))
_BASE = forward_pallas._BASE


def resident_budget_bytes(env_mb):
    """Shared by the forward and gradient fused kernels."""
    if env_mb < 0:
        return 0
    return int((env_mb or 12.0) * 1024 * 1024)


def group_for(num_tiles):
    """Tiles per fused grid step: the group must divide the tile count
    (groups never straddle images), so auto picks the largest of 8/4/2
    that does."""
    if GROUP:
        return GROUP if num_tiles % GROUP == 0 else 1
    for g in (8, 4, 2):
        if num_tiles % g == 0:
            return g
    return 1


def depth_for():
    return DEPTH or 4


def tile_h_for():
    """Round-3 fused-schedule device sweep (v5e, 16x256^2): 4-row tiles win
    the fused forward at every measured size -- 2.70 ms at 512 faces (vs
    3.02 at 8 rows, 3.48 at 8x c128), 7.96 at 2048, 31.24 at 8192 -- and
    2-row tiles lose (3.66 at 512f).  Narrow tiles shrink the per-visit
    [CHUNK, PIX] sweep to each face's actual footprint faster than they add
    block visits.  The slot schedule keeps its original 32 rows: its grid
    scales with the slot count, so finer tiles multiply fixed grid-step
    cost instead of amortising it in-kernel."""
    return TILE_H or (4 if FUSED else 32)


def chunk_for():
    """64-face blocks win the fused forward at every measured size (512f:
    2.70 vs 3.48 ms at c128; 2048f: 7.96 vs 9.23; 8192f: 31.24 vs 32.18 at
    the winning 4-row tiles); c32 loses (2.92 at 512f).  The slot schedule
    keeps the 128-face blocks measured fastest for it in round 2 (8192f:
    167 vs 156 f/s; 65k: 18.6 vs 17.3)."""
    return CHUNK or (64 if FUSED else 128)


def _cdiv(a, b):
    return -(-a // b)


def slots_per_image(num_runs, num_items):
    """Static slot-list length per image for a CSR sweep of `num_runs`
    runs (one mandatory slot each) over `num_items` candidates: one slot
    per run plus ~8x max(runs, items) overlap slack -- comfortably above
    the actual hit count for draw-order-coherent meshes."""
    env = int(_os.environ.get("DIRT_TPU_SLOTS_PER_IMAGE", "0"))
    if env > 0:
        return min(num_runs * num_items, env)
    return min(num_runs * num_items,
               max(512, num_runs + 8 * max(num_runs, num_items)))


def _morton(y, x):
    """Interleaves the low 16 bits of two non-negative int32 coordinate
    arrays (y gets the odd bits) -- the Z-order curve key."""
    def spread(v):
        v = (v | (v << 8)) & 0x00FF00FF
        v = (v | (v << 4)) & 0x0F0F0F0F
        v = (v | (v << 2)) & 0x33333333
        v = (v | (v << 1)) & 0x55555555
        return v
    return (spread(y) << 1) | spread(x)


def spatial_order(face_data, bbox_cols, tile_h, tile_w):
    """Stable spatial face ordering for block binning: a permutation of the
    table rows by the Morton code of each face's bbox-centre tile
    coordinate, so consecutive rows (and hence CHUNK-face blocks) are
    spatially adjacent regardless of draw order.  Faces with empty bboxes
    (degenerate/padding) sort last; ties keep draw order (stable sort)."""
    r0c, r1c, c0c, c1c = bbox_cols
    i32 = lambda c: face_data[:, c].astype(jnp.int32)
    r0, r1, c0, c1 = i32(r0c), i32(r1c), i32(c0c), i32(c1c)
    empty = r1 < r0
    ty = jnp.clip((r0 + r1) // 2, 0, None) // tile_h
    tx = jnp.clip((c0 + c1) // 2, 0, None) // tile_w
    key = _morton(jnp.clip(ty, 0, (1 << 15) - 1),
                  jnp.clip(tx, 0, (1 << 15) - 1))
    key = jnp.where(empty, jnp.int32(jnp.iinfo(jnp.int32).max), key)
    return jnp.argsort(key, stable=True).astype(jnp.int32)


def build_slots(hit, num_slots):
    """CSR slot list for one image from the [T, NB] bool hit matrix.

    Returns (slot_tile [S], slot_block [S], slot_dma [S], dropped []) int32.
    Consecutive slots with the same tile form that tile's run: all hitting
    blocks in draw order.  A tile with zero hits still gets one slot with
    block -1 (so the kernel initialises its state) and filler tail slots
    repeat the last tile with block -1; slot_dma forward-fills block ids so
    no-op slots keep the resident face block.

    ``dropped`` counts the slots the static budget could not hold (the
    truncated tail tiles degrade to background via the aliased init); see
    reference.RasterAux.dropped for how callers surface it.
    """
    num_tiles, num_blocks = hit.shape
    order = jnp.argsort(jnp.logical_not(hit), axis=1,
                        stable=True).astype(jnp.int32)     # [T, NB]
    n = jnp.sum(hit, axis=1).astype(jnp.int32)             # [T]
    m = jnp.maximum(n, 1)                                  # >=1 slot per tile
    start = jnp.cumsum(m) - m                              # exclusive prefix

    j = jnp.arange(num_blocks, dtype=jnp.int32)[None, :]   # [1, NB]
    valid = j < m[:, None]                                 # [T, NB]
    pos = jnp.where(valid, start[:, None] + j, num_slots)  # OOB -> dropped
    tile_of = jnp.broadcast_to(
        jnp.arange(num_tiles, dtype=jnp.int32)[:, None], pos.shape)
    block_of = jnp.where(j < n[:, None], order, -1)

    slot_tile = jnp.zeros((num_slots,), jnp.int32).at[pos.reshape(-1)].set(
        tile_of.reshape(-1), mode="drop")
    slot_block = jnp.full((num_slots,), -1, jnp.int32).at[
        pos.reshape(-1)].set(block_of.reshape(-1), mode="drop")
    # Filler tail: repeat the last real tile so the resident output block
    # never switches on no-op steps.
    total = jnp.minimum(jnp.sum(m), num_slots)
    last_tile = jnp.where(total > 0, slot_tile[jnp.maximum(total - 1, 0)], 0)
    tail = jnp.arange(num_slots, dtype=jnp.int32) >= total
    slot_tile = jnp.where(tail, last_tile, slot_tile)
    slot_block = jnp.where(tail, -1, slot_block)
    # DMA target per slot: inactive slots (block -1) repeat the previous
    # active block so the resident face block never switches without need.
    idx = jnp.arange(num_slots, dtype=jnp.int32)
    last_active = jax.lax.cummax(jnp.where(slot_block >= 0, idx, -1))
    slot_dma = jnp.where(
        last_active >= 0,
        slot_block[jnp.maximum(last_active, 0)], 0)
    dropped = jnp.maximum(jnp.sum(m) - num_slots, 0)
    return slot_tile, slot_block, slot_dma, dropped


def _edge_keep(face_data, edge_cols, tiles_y, tiles_x, tile_h, tile_w,
               height, width, dilate):
    """[Ty, Tx, F] bool: the face's edge-sign regions can reach the tile.

    Coverage (geometry.fragment_cover_depth) requires all three edge
    functions >= 0 or all <= 0 at a pixel centre; E_i is linear in NDC, so
    its extreme over the tile's pixel-centre rectangle sits at a corner.
    A tile is culled iff some edge is strictly negative everywhere AND some
    edge is strictly positive everywhere (then neither sign branch can
    accept any pixel).  An 8-ulp margin on |a| + |b| + |c| absorbs the
    rounding of both this corner evaluation and the kernel's per-pixel
    evaluation, so E == 0 fill-rule pixels can never be culled.  `dilate`
    extends the rectangle by whole pixels (the gradient kernels' support is
    coverage dilated one pixel along an axis).
    """
    c_lo = jnp.arange(tiles_x, dtype=jnp.float32) * tile_w - dilate
    c_hi = c_lo + (tile_w - 1) + 2 * dilate
    r_lo = jnp.arange(tiles_y, dtype=jnp.float32) * tile_h - dilate
    r_hi = r_lo + (tile_h - 1) + 2 * dilate
    x_lo = (c_lo + 0.5) * (2.0 / width) - 1.0     # x_ndc increases with col
    x_hi = (c_hi + 0.5) * (2.0 / width) - 1.0
    y_hi = 1.0 - (r_lo + 0.5) * (2.0 / height)    # y_ndc decreases with row
    y_lo = 1.0 - (r_hi + 0.5) * (2.0 / height)

    any_max_neg = jnp.zeros((tiles_y, tiles_x, 1), bool)
    any_min_pos = jnp.zeros((tiles_y, tiles_x, 1), bool)
    for i in range(3):
        a = face_data[:, edge_cols + 3 * i]                   # [F]
        b = face_data[:, edge_cols + 3 * i + 1]
        c = face_data[:, edge_cols + 3 * i + 2]
        margin = (2.0 ** -20) * (jnp.abs(a) + jnp.abs(b) + jnp.abs(c))
        ax_max = a * jnp.where(a[None] > 0, x_hi[:, None], x_lo[:, None])
        ax_min = a * jnp.where(a[None] > 0, x_lo[:, None], x_hi[:, None])
        by_max = b * jnp.where(b[None] > 0, y_hi[:, None], y_lo[:, None])
        by_min = b * jnp.where(b[None] > 0, y_lo[:, None], y_hi[:, None])
        emax = by_max[:, None, :] + (ax_max + c)[None]        # [Ty, Tx, F]
        emin = by_min[:, None, :] + (ax_min + c)[None]
        any_max_neg = any_max_neg | (emax < -margin)
        any_min_pos = any_min_pos | (emin > margin)
    return jnp.logical_not(any_max_neg & any_min_pos)


def _hit_kernel(tbl_ref, out_ref, *, bbox_cols, edge_cols, tiles_y, tiles_x,
                tile_h, tile_w, height, width, dilate, use_edges):
    """Whole keep plane [T, F] for one image in one kernel: faces ride the
    lanes ([1, F] table-column rows), tiles the sublanes ([T, 1] iota
    scalars).  Expression tree mirrors the XLA hit_matrix/_edge_keep path
    term for term so the results agree (bitwise on device in practice;
    conservativeness is margin-guaranteed regardless)."""
    num_tiles = tiles_y * tiles_x
    t = jax.lax.broadcasted_iota(jnp.int32, (num_tiles, 1), 0)
    ty = t // tiles_x
    tx = jax.lax.rem(t, tiles_x)
    r0c, r1c, c0c, c1c = bbox_cols

    def row(i):
        return tbl_ref[i:i + 1, :]                         # [1, F]

    tile_r0 = (ty * tile_h).astype(jnp.float32)            # [T, 1]
    tile_c0 = (tx * tile_w).astype(jnp.float32)
    keep = ((row(r0c) <= tile_r0 + (tile_h - 1))
            & (row(r1c) >= tile_r0)
            & (row(c0c) <= tile_c0 + (tile_w - 1))
            & (row(c1c) >= tile_c0))                       # [T, F]

    if use_edges:
        # Same tile-rectangle NDC corners as _edge_keep (c_lo/r_lo built
        # from the same f32 products, so identical values).
        c_lo = tile_c0 - dilate
        c_hi = c_lo + (tile_w - 1) + 2 * dilate
        r_lo = tile_r0 - dilate
        r_hi = r_lo + (tile_h - 1) + 2 * dilate
        x_lo = (c_lo + 0.5) * (2.0 / width) - 1.0
        x_hi = (c_hi + 0.5) * (2.0 / width) - 1.0
        y_hi = 1.0 - (r_lo + 0.5) * (2.0 / height)
        y_lo = 1.0 - (r_hi + 0.5) * (2.0 / height)

        any_max_neg = None
        any_min_pos = None
        for i in range(3):
            a = row(edge_cols + 3 * i)                     # [1, F]
            b = row(edge_cols + 3 * i + 1)
            c = row(edge_cols + 3 * i + 2)
            margin = (2.0 ** -20) * (jnp.abs(a) + jnp.abs(b) + jnp.abs(c))
            a_pos = a > 0
            b_pos = b > 0
            ax_max = a * jnp.where(a_pos, x_hi, x_lo)      # [T, F]
            ax_min = a * jnp.where(a_pos, x_lo, x_hi)
            by_max = b * jnp.where(b_pos, y_hi, y_lo)
            by_min = b * jnp.where(b_pos, y_lo, y_hi)
            emax = by_max + (ax_max + c)
            emin = by_min + (ax_min + c)
            mx = emax < -margin
            mn = emin > margin
            any_max_neg = mx if any_max_neg is None else any_max_neg | mx
            any_min_pos = mn if any_min_pos is None else any_min_pos | mn
        keep = keep & jnp.logical_not(any_max_neg & any_min_pos)

    out_ref[...] = jnp.where(keep, 1.0, 0.0)


def _hit_matrix_pallas(face_data, bbox_cols, num_blocks, chunk,
                       tiles_y, tiles_x, tile_h, tile_w,
                       edge_cols, height, width, dilate, use_edges):
    from . import dispatch
    interpret = not dispatch.on_accelerator()
    num_tiles = tiles_y * tiles_x
    kernel = functools.partial(
        _hit_kernel, bbox_cols=bbox_cols, edge_cols=edge_cols,
        tiles_y=tiles_y, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w,
        height=height, width=width, dilate=dilate, use_edges=use_edges)
    keep = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles, face_data.shape[0]), jnp.float32),
        # The live set is ~8 [T, F] planes (keep + per-edge extremes):
        # 33.75 MB at 16x256^2x8192f, over the 16 MB default -- match the
        # raster kernels' raised limit.  HIT_PALLAS_BYTES gates the keep
        # plane at 8 MB so the worst case stays ~64 MB.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(face_data.T)
    overlap = keep > 0.5
    overlap = overlap.reshape(num_tiles, num_blocks, chunk)
    return jnp.any(overlap, axis=-1)


def hit_matrix(face_data, bbox_cols, num_blocks, chunk,
               tiles_y, tiles_x, tile_h, tile_w,
               edge_cols=None, height=None, width=None, dilate=0):
    """[T, NB] bool: block hits tile iff any member face's bbox overlaps.

    With `edge_cols` (column of the first edge coefficient; 9 consecutive
    a,b,c per edge) the bbox test is refined by the exact half-plane cull
    (_edge_keep): a block visits a tile only if some member face's
    edge-sign regions can actually reach it -- a large visit reduction for
    thin/diagonal faces whose bboxes are mostly empty space.

    DIRT_TPU_HIT_PALLAS computes the per-(tile, face) test as ONE Pallas
    kernel (_hit_kernel) instead of ~30 XLA fusions (see the flag comment
    for why schedule correctness never depends on bitwise hit equality).
    """
    use_edges = edge_cols is not None and EDGE_CULL
    if (HIT_PALLAS and tiles_y * tiles_x * face_data.shape[0] * 4
            <= HIT_PALLAS_BYTES):
        return _hit_matrix_pallas(
            face_data, bbox_cols, num_blocks, chunk, tiles_y, tiles_x,
            tile_h, tile_w, edge_cols, height, width, dilate, use_edges)
    r0c, r1c, c0c, c1c = bbox_cols
    tile_r0 = jnp.arange(tiles_y, dtype=jnp.int32) * tile_h
    tile_c0 = jnp.arange(tiles_x, dtype=jnp.int32) * tile_w
    hit_rows = ((face_data[None, :, r0c] <= (tile_r0 + tile_h - 1)[:, None])
                & (face_data[None, :, r1c] >= tile_r0[:, None]))
    hit_cols = ((face_data[None, :, c0c] <= (tile_c0 + tile_w - 1)[:, None])
                & (face_data[None, :, c1c] >= tile_c0[:, None]))
    overlap = hit_rows[:, None, :] & hit_cols[None, :, :]    # [Ty, Tx, F]
    if edge_cols is not None and EDGE_CULL:
        overlap = overlap & _edge_keep(
            face_data, edge_cols, tiles_y, tiles_x, tile_h, tile_w,
            height, width, dilate)
    overlap = overlap.reshape(tiles_y * tiles_x, num_blocks, chunk)
    return jnp.any(overlap, axis=-1)


def _raster_kernel(slot_tile_ref, slot_block_ref, slot_dma_ref,
                   face_ref, init_ref, state_ref,
                   *, height, width, channels, tiles_x, num_tiles,
                   tile_h, tile_w):
    del slot_dma_ref  # consumed by the face BlockSpec's index_map
    del init_ref      # aliased to state_ref: overflow-safe background init
    pix = tile_h * tile_w
    ns = channels + 9
    s = pl.program_id(0)
    bt = slot_tile_ref[s]
    tile = jax.lax.rem(bt, num_tiles)
    tile_row = (tile // tiles_x) * tile_h
    tile_col = jax.lax.rem(tile, tiles_x) * tile_w
    prev_bt = slot_tile_ref[jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, bt != prev_bt)

    @pl.when(first)
    def _init():
        state_ref[0] = forward_dense.init_state(channels, pix)

    @pl.when(slot_block_ref[s] >= 0)
    def _process():
        xg, yg = forward_dense.pixel_ndc(tile_row, tile_col, height, width,
                                         pix, tile_w)

        def col(i):
            return face_ref[0, :, i:i + 1]                  # [CHUNK, 1]

        # The shared chunk-sweep math keeps this backend's per-fragment
        # arithmetic the same expression tree as the dense kernels'
        # (bit-exact-visibility invariant).
        cand, best_depth, best_orig = forward_dense.chunk_candidates(
            col, xg, yg, channels)
        state_ref[0] = forward_dense.merge_state(
            state_ref[0], cand, best_depth, best_orig, ns)


# Sort-free build_runs: replace the stable argsort (hits first) with a
# per-run cumsum rank scatter.  The slot list is IDENTICAL bitwise: the
# argsort places the j'-th smallest hit item at starts[r] + j', and the
# rank of hit item j among its run's hits IS j' (both orders are
# ascending item index), so every scatter writes the same value to the
# same position.  Default OFF: the device A/B (sweeps/_sweep_runs.py,
# BASELINE.md round-5) measured it NEUTRAL-to-slightly-worse (pack
# 0.416 -> 0.423 ms, step -1%) -- the [R, I]-shaped stable argsort is
# already as cheap as the cumsum+scatter that replaces it, unlike the
# round-3 [T, rows, NCK] per-tile packs where sort-free forms lost big.
# Kept as the measured falsification + an exactness cross-check
# (tests/test_hit_kernel.py pins both paths identical).
RUNS_SORTFREE = _os.environ.get("DIRT_TPU_RUNS_SORTFREE", "0") != "0"


def build_runs(hit, num_slots):
    """Fused-CSR schedule for one image from the [R, I] bool hit matrix:
    (starts [R], counts [R], item_ids [S], dropped []) i32.  Run r's live
    items (ascending draw order) occupy item_ids[starts[r] : starts[r] +
    counts[r]]; zero-hit runs need no slot (the fused kernels initialise
    their output unconditionally).  Tail truncation by the static budget
    clamps the last runs' counts and is counted in ``dropped``."""
    num_runs, num_items = hit.shape
    n = jnp.sum(hit, axis=1).astype(jnp.int32)             # [R]
    total = jnp.cumsum(n)                                  # inclusive prefix
    # Clamp BOTH ends of each run's slot range to the budget so that
    # starts[r] + counts[r] == starts[r + 1] holds even when the tail is
    # truncated: the grouped forward kernel pipelines DMAs by flat ordinal
    # across consecutive runs and needs the visit sequence gap-free.
    starts = jnp.minimum(total - n, num_slots)
    counts = jnp.minimum(total, num_slots) - starts
    j = jnp.arange(num_items, dtype=jnp.int32)[None, :]
    if RUNS_SORTFREE:
        rank = jnp.cumsum(hit, axis=1).astype(jnp.int32) - 1   # [R, I]
        pos = jnp.where(hit, starts[:, None] + rank, num_slots)
        values = jnp.broadcast_to(j, pos.shape)
    else:
        order = jnp.argsort(jnp.logical_not(hit), axis=1,
                            stable=True).astype(jnp.int32)     # hits first
        pos = jnp.where(j < n[:, None], starts[:, None] + j, num_slots)
        values = order
    item_ids = jnp.zeros((num_slots,), jnp.int32).at[
        pos.reshape(-1)].set(values.reshape(-1), mode="drop")
    dropped = jnp.maximum(jnp.sum(n) - num_slots, 0)
    return starts, counts, item_ids, dropped


def _raster_kernel_fused_resident(start_ref, count_ref, block_ids_ref,
                                  face_ref, state_ref, *, height, width,
                                  channels, tiles_x, num_tiles, tile_h,
                                  tile_w, group, blocks_per_image):
    """Resident variant of the grouped fused kernel: the image's WHOLE
    face table arrives as one VMEM block (fetched by the Pallas pipeline
    once per image -- consecutive grid steps with an unchanged index_map
    skip the re-fetch), and each visit reads its face block by dynamic
    index instead of streaming it through a manual DMA.  Removes the
    per-visit DMA start + semaphore wait (~the measured 1.5-2 us gap
    between per-visit time and the sweep's op-count floor) for every mesh
    whose per-image table fits the VMEM budget (auto threshold in
    rasterise_batch).  Output is bit-exact vs the DMA schedule: identical
    sweep expression tree and visit order, only the face-block transport
    differs."""
    pix = tile_h * tile_w
    ns = channels + 9
    r = pl.program_id(0)
    t0 = r * group

    for g in range(group):
        t = t0 + g
        tile = jax.lax.rem(t, num_tiles)
        tile_row = (tile // tiles_x) * tile_h
        tile_col = jax.lax.rem(tile, tiles_x) * tile_w
        start = start_ref[t]
        n = count_ref[t]
        xg, yg = forward_dense.pixel_ndc(tile_row, tile_col, height, width,
                                         pix, tile_w)

        def body(i, state, start=start, xg=xg, yg=yg):
            # block_ids are batch-folded; the BlockSpec already selected
            # this image's table slice.
            bid = jax.lax.rem(block_ids_ref[start + i], blocks_per_image)

            def col(j):
                return face_ref[0, bid, :, j:j + 1]         # [CHUNK, 1]

            cand, best_depth, best_orig = forward_dense.chunk_candidates(
                col, xg, yg, channels)
            return forward_dense.merge_state(
                state, cand, best_depth, best_orig, ns)

        state_ref[0, g] = jax.lax.fori_loop(
            0, n, body, forward_dense.init_state(channels, pix))


def _raster_kernel_fused(start_ref, count_ref, block_ids_ref, *rest,
                         height, width, channels, tiles_x, num_tiles,
                         tile_h, tile_w, group, depth):
    """One grid step per (batch, GROUP-of-tiles): sweep each tile's live
    face blocks with the z-state in vector registers, streaming the
    [CHUNK, D] face blocks HBM->VMEM through a `depth`-deep rotating
    scratch (the DMA for visit q+depth-1 is issued before the sweep of
    visit q, so up to depth-1 transfers are in flight across tile
    boundaries).  Grouping amortises the Pallas per-grid-step fixed cost
    (~1 us, round-3/4 measurements) over `group` tiles without widening
    any sweep; the visit ordinals are flat across the group's tiles
    (build_runs guarantees starts[t] + counts[t] == starts[t + 1] even
    under budget truncation).  Sweep/merge math is shared with the dense
    kernels, and each tile's state still rides its own register-carried
    fori_loop, so the output is bit-exact vs the ungrouped and slot
    schedules."""
    face_hbm, state_ref, scratch, sem = rest
    pix = tile_h * tile_w
    ns = channels + 9
    r = pl.program_id(0)
    t0 = r * group
    group_start = start_ref[t0]
    group_total = (start_ref[t0 + group - 1] + count_ref[t0 + group - 1]
                   - group_start)

    def get_dma(q):
        # Visit ordinal q within the group -> slot q % depth.
        p = group_start + q
        slot = jax.lax.rem(q, depth)
        return pltpu.make_async_copy(
            face_hbm.at[block_ids_ref[p]], scratch.at[slot], sem.at[slot])

    for j in range(depth - 1):
        @pl.when(j < group_total)
        def _warmup(j=j):
            get_dma(j).start()

    for g in range(group):
        t = t0 + g
        tile = jax.lax.rem(t, num_tiles)
        tile_row = (tile // tiles_x) * tile_h
        tile_col = jax.lax.rem(tile, tiles_x) * tile_w
        start = start_ref[t]
        n = count_ref[t]
        base = start - group_start
        xg, yg = forward_dense.pixel_ndc(tile_row, tile_col, height, width,
                                         pix, tile_w)

        def body(i, state, base=base, xg=xg, yg=yg):
            q = base + i
            slot = jax.lax.rem(q, depth)

            @pl.when(q + depth - 1 < group_total)
            def _prefetch():
                get_dma(q + depth - 1).start()

            get_dma(q).wait()

            def col(j):
                return scratch[slot, :, j:j + 1]            # [CHUNK, 1]

            cand, best_depth, best_orig = forward_dense.chunk_candidates(
                col, xg, yg, channels)
            return forward_dense.merge_state(
                state, cand, best_depth, best_orig, ns)

        state_ref[0, g] = jax.lax.fori_loop(
            0, n, body, forward_dense.init_state(channels, pix))


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
        pixels0, aux0 = jax.vmap(reference.shade_pixels)(
            jnp.full((batch, height, width), -1, jnp.int32),
            geometry.face_setup(vertices, faces), faces, vertex_colors,
            background)
        return pixels0, aux0._replace(
            dropped=jnp.zeros((batch,), jnp.int32))

    tile_h, tile_w = tile_h_for(), TILE_W
    chunk = chunk_for()
    num_blocks = _cdiv(num_faces, chunk)
    tiles_y = _cdiv(height, tile_h)
    tiles_x = _cdiv(width, tile_w)
    num_tiles = tiles_y * tiles_x
    num_slots = slots_per_image(num_tiles, num_blocks)
    width_d = _BASE + 3 * channels
    pix = tile_h * tile_w
    ns = channels + 9

    def pack_one(v, c, f):
        face_data = forward_pallas._face_table(
            v, c, f, height, width, num_blocks * chunk - num_faces)
        if SPATIAL:
            order = spatial_order(face_data, (20, 21, 22, 23),
                                  tile_h, tile_w)
            face_data = jnp.take(face_data, order, axis=0)
        hit = hit_matrix(face_data, (20, 21, 22, 23), num_blocks, chunk,
                         tiles_y, tiles_x, tile_h, tile_w,
                         edge_cols=0, height=height, width=width)
        table = face_data.reshape(num_blocks, chunk, width_d)
        if FUSED:
            return table, *build_runs(hit, num_slots)
        slot_tile, slot_block, slot_dma, dropped = build_slots(hit, num_slots)
        return table, slot_tile, slot_block, slot_dma, dropped

    packed = jax.vmap(pack_one)(vertices, vertex_colors, faces)
    face_table, csr_a, csr_b, csr_c, dropped = packed
    # Flat 1-D prefetch arrays (a >1-D trailing dim pads to 128 SMEM lanes);
    # fold the batch index into the tile/block ids so the batch is one run.
    boff = jnp.arange(batch, dtype=jnp.int32)[:, None]
    face_table = face_table.reshape(batch * num_blocks, chunk, width_d)

    if FUSED:
        starts = (csr_a + num_slots * boff).reshape(-1)        # [B*T]
        counts = csr_b.reshape(-1)                             # [B*T]
        block_ids = (csr_c + num_blocks * boff).reshape(-1)    # [B*S]
        # Manual-DMA slices must be aligned to the f32 (8, 128) tiling on
        # BOTH ends (Mosaic rejects a 36-lane block copy), so the fused
        # path pads the face row to full lanes; the kernel never reads the
        # pad columns.
        width_dma = _cdiv(width_d, 128) * 128
        face_table = jnp.pad(face_table,
                             ((0, 0), (0, 0), (0, width_dma - width_d)))
        group = group_for(num_tiles)
        depth = depth_for()
        table_bytes = num_blocks * chunk * width_dma * 4
        resident = table_bytes <= resident_budget_bytes(RESIDENT_MB)
        if resident:
            steps_per_image = num_tiles // group
            kernel = functools.partial(
                _raster_kernel_fused_resident, height=height, width=width,
                channels=channels, tiles_x=tiles_x, num_tiles=num_tiles,
                tile_h=tile_h, tile_w=tile_w, group=group,
                blocks_per_image=num_blocks)
            in_specs = [
                # The image's whole table as one VMEM block: the pipeline
                # fetches it once per image (index_map constant across the
                # image's tile-group steps).
                pl.BlockSpec((1, num_blocks, chunk, width_dma),
                             lambda r, *_: (r // steps_per_image, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            scratch_shapes = []
            face_arg = face_table.reshape(
                batch, num_blocks, chunk, width_dma)
        else:
            kernel = functools.partial(
                _raster_kernel_fused, height=height, width=width,
                channels=channels, tiles_x=tiles_x, num_tiles=num_tiles,
                tile_h=tile_h, tile_w=tile_w, group=group, depth=depth)
            in_specs = [
                # Face blocks stay in HBM; the kernel streams the group's
                # live visits through a depth-slot rotating VMEM scratch.
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            scratch_shapes = [
                pltpu.VMEM((depth, chunk, width_dma), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ]
            face_arg = face_table
        grid_spec = pltpu.PrefetchScalarGridSpec(
            # starts, counts [B*T], block_ids [B*S]
            num_scalar_prefetch=3,
            grid=(batch * num_tiles // group,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, group, ns, pix),
                                   lambda r, *_: (r, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch_shapes,
        )
        state = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (batch * num_tiles // group, group, ns, pix), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # The ANY-placed face table is VMEM-resident when it fits;
                # the 16 MB scoped default is ~1% short at the bench config.
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(starts, counts, block_ids, face_arg)
    else:
        slot_tile = (csr_a + num_tiles * boff).reshape(-1)     # [B*S]
        slot_block = csr_b.reshape(-1)                         # active flag
        slot_dma = (csr_c + num_blocks * boff).reshape(-1)     # DMA target

        kernel = functools.partial(
            _raster_kernel, height=height, width=width, channels=channels,
            tiles_x=tiles_x, num_tiles=num_tiles,
            tile_h=tile_h, tile_w=tile_w)

        # Aliased init buffer: if the static slot budget ever truncates a
        # tile's mandatory slot (pathologically incoherent draw order past
        # the 8x slack), its state block is never visited -- with the
        # background-init rows aliased in, such a tile degrades to
        # background instead of decoding uninitialised memory.
        init_row = jnp.concatenate([
            jnp.zeros((channels + 7,), jnp.float32),
            jnp.asarray([1.0, -1.0], jnp.float32)])
        state_init = jnp.broadcast_to(
            init_row[None, :, None], (batch * num_tiles, ns, pix))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,      # slot_tile, slot_block, slot_dma
            grid=(batch * num_slots,),
            in_specs=[
                pl.BlockSpec((1, chunk, width_d),
                             lambda s, tiles, blocks, dma: (dma[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ns, pix),
                             lambda s, tiles, blocks, dma:
                             (tiles[s], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ns, pix),
                                   lambda s, tiles, blocks, dma:
                                   (tiles[s], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        state = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (batch * num_tiles, ns, pix), jnp.float32),
            # Input 4 = state_init (after 3 scalar-prefetch args and the
            # face table); aliasing donates it as the output buffer.
            input_output_aliases={4: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(slot_tile, slot_block, slot_dma, face_table, state_init)

    state = state.reshape(batch, num_tiles, ns, pix)
    pixels, aux = forward_dense.finalize(state, background, height, width,
                                         tiles_y, tiles_x,
                                         tile_h=tile_h, tile_w=tile_w)
    return pixels, aux._replace(dropped=dropped)
