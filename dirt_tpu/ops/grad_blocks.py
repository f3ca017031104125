"""Block-binned (CSR) face-major Pallas TPU kernel for the gradient
scatters.

Same gradient math as ops/grad_dense.py (dense [CHUNK, PIX] masked VPU
reductions; semantics of the reference's assemble_grads,
csrc/rasterise_grad_egl.cu:93-236), restructured for large meshes with the
CSR slot scheme of ops/forward_blocks.py transposed to FACE-MAJOR:

  * The face table is stored once per image at [num_blocks, CHUNK, _DF]
    (faces grouped into blocks of CHUNK consecutive draw-order faces).
  * Runs are face blocks; slot items are the tiles whose pixels the
    block's member bboxes overlap.  The kernel accumulates each block's
    per-face masked-reduction sums across its tiles into ONE
    [CHUNK, d_out] output block (consecutive-revisit accumulation), so
    output memory is O(faces) -- the tile-major partial-sum layout OOMs at
    65,536 faces (a 4 GB array plus its lane-padded reshape), exactly the
    scatter-memory blow-up SURVEY.md section 7 warned about.
  * One grid step per actual (block, tile) overlap plus one mandatory slot
    per block (zero-initialises its sums); filler slots repeat the
    previous tile's planes block (no DMA) and skip compute.

The trade vs the tile-major grad_dense kernel: the pixel-plane block
(~n_planes x TILE_H*TILE_W floats) streams once per (block, tile) visit
instead of once per tile.  Measured on v5e (round 3) this kernel
nevertheless wins at EVERY size -- 2.6 ms vs 7.9 ms at the 512-face bench
config -- because its O(faces) output rows feed a segment_sum 16x smaller
than the tile-major layout's num_tiles x num_chunks x CHUNK rows, so it
is the production gradient path (backward._auto_grad_kernel).

The gradient bboxes are one pixel wider than the forward's (dilation
support), so the binning is computed from the gradient face table.
"""

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import backward, forward_blocks, grad_dense, grad_tables, prepass_fused

# 0 = auto (tile_h_for); a non-zero env value pins the row count.
TILE_H = int(_os.environ.get("DIRT_TPU_GRAD_BLOCKS_TILE_H", 0))
TILE_W = int(_os.environ.get("DIRT_TPU_GRAD_BLOCKS_TILE_W", 128))


def tile_h_for(num_faces):
    """Round-3 v5e sweeps.  Fused schedule: 8-row tiles win at every
    measured size (512f: 2.00-2.16 ms vs 2.21 at 16 rows; 2048f: 5.44 vs
    6.91; 8192f: 23.5 vs 26.0) -- its in-kernel visit loop amortises the
    extra tile visits that finer tiles add.  Slot schedule: 16-row tiles
    win at the 512-face bench config (2.11 vs 2.59 ms at 32 rows) and
    8-row tiles past ~2k faces (2.96 vs 3.28 at 2048, 7.12 vs 7.72 at
    8192) -- each extra visit there costs a whole grid step.  Smaller
    faces have smaller bbox footprints, so finer tiles cut wasted
    [CHUNK, PIX] sweep width faster than they add (block, tile) visits."""
    if TILE_H:
        return TILE_H
    if FUSED:
        return 8
    return 16 if num_faces <= 1024 else 8
# 128-face blocks measured fastest at both large recorded slot configs
# (8192f: 167 vs 156 f/s; 65k: 18.6 vs 17.3; c32 slower) AND for the
# fused schedule (512f: 2.00 ms vs 2.33 at c64, 2.24 at c256): fewer
# grid steps / visits and better chunk occupancy outweigh the coarser
# hit granularity once faces are small.
CHUNK = int(_os.environ.get("DIRT_TPU_GRAD_BLOCKS_CHUNK", 128))
# Fused-CSR schedule: grid (batch * blocks), in-kernel loop over the
# block's live tile visits with double-buffered manual DMA of the plane
# tiles -- no filler grid steps (the slot schedule pads every image to
# the static budget) and no per-slot pipeline bookkeeping.
FUSED = _os.environ.get("DIRT_TPU_GRAD_BLOCKS_FUSED", "1") != "0"
# Fused Pallas pre-pass (ops/prepass_fused.py): Scharr + dilation +
# viewport factors + the tile-major plane-stack layout in one
# VMEM-resident kernel instead of ~10 XLA HBM round trips.  Falls back
# to backward.grad_prepass when the image exceeds the kernel's VMEM
# budget or the tile grid does not divide it.
PREPASS = _os.environ.get("DIRT_TPU_FUSED_PREPASS", "1") != "0"
# (REMOVED, round 4: gradient sub-chunk clipping, DIRT_TPU_GRAD_SUBCLIP.
# It was doubly condemned by the round-4 measurements -- the [SUB, PIX]
# reduction expression tree is not bitwise vs [CHUNK, PIX] (breaking the
# fused/slot cross-check), AND the device A/B lost outright: bwd
# 1.91->2.52 ms at 512 faces, 5.68->8.6 at 2048 (sweeps/_sweep_subclip.py,
# BASELINE.md).)
# Rotating DMA scratch slots for the fused schedule (0 = auto = 4): see
# forward_blocks.DEPTH -- keeps depth-1 plane-tile transfers in flight so
# the reduction is not DMA-latency-bound in the many-visit regimes.
DEPTH = int(_os.environ.get("DIRT_TPU_GRAD_BLOCKS_DEPTH", "0"))


# Resident plane-stack mode: when the per-image tile-major plane stack
# fits the budget (see forward_blocks.resident_budget_bytes), it rides a
# per-image VMEM BlockSpec (one pipeline fetch per image) and visits read
# their tile's planes by dynamic index -- no per-visit DMA start/wait.
# MB; -1 = never, 0 = auto (12 MB).  Default AUTO: a consistent 2-3%
# win at every measured size, bit-exact vs the DMA schedule on device
# (BASELINE.md "Round-4 resident VMEM table A/B").
RESIDENT_MB = float(_os.environ.get("DIRT_TPU_GRAD_RESIDENT_MB", "0"))
# (REMOVED, round 4: accumulate-then-reduce schedule, DIRT_TPU_GRAD_ACCUM.
# Visits ADDED [CHUNK, PIX] product planes into a VMEM accumulator with
# the PIX reduction hoisted to once per block.  The device A/B LOST at
# every size (1.88->2.19 ms at 512 faces, 23.8->27.1 at 8192;
# sweeps/_sweep_gaccum.py, BASELINE.md): the 3-access VMEM read-modify-
# write per product plane costs more than the per-visit reduction tails
# it saves -- Mosaic's cross-lane reductions are efficient, and the
# round-4 partition A/B's "t4c128 matches t8c128" datum is explained by
# loop/index overhead, not reduction tails.)


def depth_for():
    return DEPTH or 4


def _cdiv(a, b):
    return -(-a // b)


def _grad_kernel(run_ref, item_ref, dma_ref, face_ref, planes_ref,
                 zeros_ref, out_ref, *, channels, parts):
    del dma_ref    # consumed by the planes BlockSpec's index_map
    del zeros_ref  # aliased to out_ref: overflow-safe zero init
    d_out = grad_dense.d_out_for(parts, channels)
    s = pl.program_id(0)
    run = run_ref[s]
    prev_run = run_ref[jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, run != prev_run)

    @pl.when(first)
    def _init():
        out_ref[0] = jnp.zeros((CHUNK, d_out), jnp.float32)

    @pl.when(item_ref[s] >= 0)
    def _process():
        def plane(i):
            return planes_ref[0, i:i + 1, :]               # [1, PIX]

        def col(i):
            return face_ref[0, :, i:i + 1]                 # [CHUNK, 1]

        # Shared reduction math (ops/grad_dense.chunk_sums) keeps this
        # backend's arithmetic identical to the dense kernels'.
        out_ref[0] += grad_dense.chunk_sums(col, plane, channels, parts)


def _grad_kernel_fused_resident(start_ref, count_ref, tile_ids_ref,
                                face_ref, planes_ref, out_ref, *,
                                channels, tiles_per_image, parts):
    """Resident variant of the fused gradient kernel: the image's WHOLE
    tile-major plane stack arrives as one VMEM block (fetched by the
    Pallas pipeline once per image) and each visit reads its tile's
    planes by dynamic index instead of streaming them through a manual
    DMA.  Accumulation order is unchanged (tiles ascending), so the
    output is bit-exact vs the DMA schedule."""
    d_out = grad_dense.d_out_for(parts, channels)
    r = pl.program_id(0)
    start = start_ref[r]
    n = count_ref[r]

    def body(i, acc):
        tid = jax.lax.rem(tile_ids_ref[start + i], tiles_per_image)

        def plane(j):
            return planes_ref[0, tid, j:j + 1, :]          # [1, PIX]

        def col(j):
            return face_ref[0, :, j:j + 1]                 # [CHUNK, 1]

        return acc + grad_dense.chunk_sums(col, plane, channels, parts)

    out_ref[0] = jax.lax.fori_loop(
        0, n, body, jnp.zeros((CHUNK, d_out), jnp.float32))


def _grad_kernel_fused(start_ref, count_ref, tile_ids_ref, *rest,
                       channels, depth, parts):
    """One grid step per (batch, face block): accumulate the block's
    [CHUNK, d_out] sums over its live tile visits, streaming the
    [n_planes, pix] plane tiles HBM->VMEM through a `depth`-slot rotating
    scratch (up to depth-1 DMAs in flight ahead of the reduction).
    Accumulation order matches the slot kernel's (tiles ascending), so
    the two schedules agree bit-for-bit."""
    face_ref, planes_hbm, out_ref, scratch, sem = rest
    d_out = grad_dense.d_out_for(parts, channels)
    r = pl.program_id(0)
    start = start_ref[r]
    n = count_ref[r]

    def get_dma(i):
        slot = jax.lax.rem(i, depth)
        return pltpu.make_async_copy(
            planes_hbm.at[tile_ids_ref[start + i]],
            scratch.at[slot], sem.at[slot])

    for j in range(depth - 1):
        @pl.when(j < n)
        def _warmup(j=j):
            get_dma(j).start()

    def body(i, acc):
        slot = jax.lax.rem(i, depth)

        @pl.when(i + depth - 1 < n)
        def _prefetch():
            get_dma(i + depth - 1).start()

        get_dma(i).wait()

        def plane(j):
            return scratch[slot, j:j + 1, :]               # [1, PIX]

        def col(j):
            return face_ref[0, :, j:j + 1]                 # [CHUNK, 1]

        return acc + grad_dense.chunk_sums(col, plane, channels, parts)

    out_ref[0] = jax.lax.fori_loop(
        0, n, body, jnp.zeros((CHUNK, d_out), jnp.float32))


def rasterise_grad_batch(vertices, faces, pixels, grad_pixels, aux,
                         interpret=None, parts="all", color_cotangent=None):
    """Block-binned face-major gradient assembly; contract and semantics
    identical to backward.rasterise_grad_batch (all arguments [B, ...]).

    `parts` ("all" / "position" / "color") selects which gradient rows
    the visit reductions compute (grad_dense.chunk_sums); the deferred
    path uses "position" for its shaded-pixels call and "color" for its
    G-buffer-cotangent call, each of which discards the other half.  The
    computed rows are bitwise-equal to the matching parts="all" outputs
    when both resolve to the same pre-pass implementation (the usual
    case; the 8-plane position stack lowers the fused pre-pass VMEM
    bound, so just past the residency boundary "position" may stay fused
    where "all" falls back to XLA -- values then agree to the documented
    pre-pass parity ~2e-7).  Uncomputed outputs return zeros.  "color"
    skips the Scharr + dilation pre-pass entirely (colour grads read
    pre-dilation coverage) and both subsets carry a commensurately
    smaller plane stack (grad_dense.plane_layout).

    `color_cotangent` (parts="all" only) selects the fused-deferred plane
    stack (grad_dense.prepass_and_planes): the colour reductions and the
    background gradient read it instead of `grad_pixels` -- ONE sweep over
    the visits computes both halves of the deferred backward."""
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
    scharr_channels = pixels.shape[-1]
    channels = (scharr_channels if color_cotangent is None
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

    num_blocks = _cdiv(num_faces, CHUNK)
    tile_h = tile_h_for(num_faces)
    tiles_y = _cdiv(height, tile_h)
    tiles_x = _cdiv(width, TILE_W)
    num_tiles = tiles_y * tiles_x
    num_slots = forward_blocks.slots_per_image(num_blocks, num_tiles)
    hp, wp = tiles_y * tile_h, tiles_x * TILE_W
    pix = tile_h * TILE_W
    n_planes = grad_dense.plane_layout(parts, channels)[0]
    d_out = grad_dense.d_out_for(parts, channels)
    np_dma = _cdiv(n_planes, 8) * 8

    # backward.DIAGONAL forces the XLA pre-pass: the fused Pallas pre-pass
    # implements the reference's two-attempt axial dilation only.  The
    # "position" subset keeps the fused pre-pass (emitting its 8-plane
    # stack -- same Scharr/dilation expressions, so bitwise vs "all");
    # "color" needs no pre-pass at all and builds its stack directly.
    fused_pre = (FUSED and PREPASS and parts in ("all", "position")
                 and not backward.DIAGONAL
                 and prepass_fused.supported(
                     height, width, scharr_channels, tile_h, TILE_W, np_dma,
                     color_channels=(0 if color_cotangent is None
                                     else channels)))
    if fused_pre:
        planes, dilated = prepass_fused.plane_stack(
            pixels, grad_pixels, aux, tile_h, TILE_W, np_dma,
            interpret=interpret, parts=parts,
            color_cotangent=color_cotangent)
        covered_pre = aux.indices[..., 0] >= 0
        cot = grad_pixels if color_cotangent is None else color_cotangent
        grad_background = jnp.where(covered_pre[..., None], 0.0, cot)
    else:
        planes, grad_background, dilated = grad_dense.prepass_and_planes(
            pixels, grad_pixels, aux, parts, color_cotangent)
        # [B, NP, H, W]
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - height),
                                  (0, wp - width)))
        planes = planes.reshape(
            batch, n_planes, tiles_y, tile_h, tiles_x, TILE_W)
        planes = planes.transpose(0, 2, 4, 1, 3, 5).reshape(
            batch * num_tiles, n_planes, pix)

    def pack_one(v, f):
        face_data = grad_tables._grad_face_table(
            v, f, height, width, num_blocks * CHUNK - num_faces)
        if forward_blocks.SPATIAL:
            order = forward_blocks.spatial_order(
                face_data, (0, 1, 2, 3), tile_h, TILE_W)
            face_data = jnp.take(face_data, order, axis=0)
        else:
            order = jnp.arange(num_blocks * CHUNK, dtype=jnp.int32)
        # dilate=1: the gradient support is rasterised coverage dilated one
        # pixel along an axis (occluder adoption), so the half-plane cull
        # tests a one-pixel-wider rectangle.
        hit = forward_blocks.hit_matrix(
            face_data, (0, 1, 2, 3), num_blocks, CHUNK,
            tiles_y, tiles_x, tile_h, TILE_W,
            edge_cols=12, height=height, width=width, dilate=1)
        # Transposed CSR: runs are blocks, items are tiles.  The dropped
        # count is discarded here: the gradient side has no aux channel, and
        # the forward pass over the same geometry (whose dilation-narrower
        # bboxes make its schedule a near-subset of this one) already
        # surfaces overflow via RasterAux.dropped before gradients run.
        table = face_data.reshape(num_blocks, CHUNK, grad_tables._DF)
        if FUSED:
            starts, counts, tile_ids, _ = forward_blocks.build_runs(
                hit.T, num_slots)
            return table, starts, counts, tile_ids, order
        slot_run, slot_item, slot_dma, _ = forward_blocks.build_slots(
            hit.T, num_slots)
        return table, slot_run, slot_item, slot_dma, order

    packed = jax.vmap(pack_one)(vertices, faces)
    face_table, csr_a, csr_b, csr_c, row_face = packed
    boff = jnp.arange(batch, dtype=jnp.int32)[:, None]
    face_table = face_table.reshape(
        batch * num_blocks, CHUNK, grad_tables._DF)

    if FUSED:
        starts = (csr_a + num_slots * boff).reshape(-1)        # [B*NB]
        counts = csr_b.reshape(-1)                             # [B*NB]
        tile_ids = (csr_c + num_tiles * boff).reshape(-1)      # [B*S]
        # Manual-DMA slices must be aligned to the f32 (8, 128) tiling on
        # BOTH ends, so the fused path pads the plane stack to full
        # sublanes; the kernel never reads the pad planes.  The fused
        # pre-pass emits the stack already padded and tile-major.
        if not fused_pre:
            planes = jnp.pad(planes,
                             ((0, 0), (0, np_dma - n_planes), (0, 0)))
        face_spec = pl.BlockSpec((1, CHUNK, grad_tables._DF),
                                 lambda r, *_: (r, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, CHUNK, d_out),
                                lambda r, *_: (r, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (batch * num_blocks, CHUNK, d_out)
        stack_bytes = num_tiles * np_dma * pix * 4
        resident = stack_bytes <= forward_blocks.resident_budget_bytes(
            RESIDENT_MB)
        if resident:
            kernel = functools.partial(
                _grad_kernel_fused_resident, channels=channels,
                tiles_per_image=num_tiles, parts=parts)
            scratch_shapes = []
            in_specs = [
                face_spec,
                # The image's whole plane stack as one VMEM block: the
                # pipeline fetches it once per image (index_map constant
                # across the image's face-block steps).
                pl.BlockSpec((1, num_tiles, np_dma, pix),
                             lambda r, *_: (r // num_blocks, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            planes_arg = planes.reshape(batch, num_tiles, np_dma, pix)
        else:
            depth = depth_for()
            kernel = functools.partial(
                _grad_kernel_fused, channels=channels, depth=depth,
                parts=parts)
            in_specs = [
                face_spec,
                # Plane tiles stay in HBM; the kernel streams the block's
                # live visits through a double-buffered VMEM scratch.
                pl.BlockSpec(memory_space=pl.ANY),
            ]
            scratch_shapes = [
                pltpu.VMEM((depth, np_dma, pix), jnp.float32),
                pltpu.SemaphoreType.DMA((depth,)),
            ]
            planes_arg = planes
        grid_spec = pltpu.PrefetchScalarGridSpec(
            # starts, counts [B*NB], tile_ids [B*S]
            num_scalar_prefetch=3,
            grid=(batch * num_blocks,),
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch_shapes,
        )
        face_grads = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # The ANY-placed plane stack is VMEM-resident when it fits;
                # match the forward kernel's raised scoped-VMEM limit.
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(starts, counts, tile_ids, face_table, planes_arg)
    else:
        slot_run = (csr_a + num_blocks * boff).reshape(-1)     # [B*S]
        slot_item = csr_b.reshape(-1)                          # active flag
        slot_dma = (csr_c + num_tiles * boff).reshape(-1)      # planes DMA

        kernel = functools.partial(_grad_kernel, channels=channels,
                                   parts=parts)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,      # slot_run, slot_item, slot_dma [B*S]
            grid=(batch * num_slots,),
            in_specs=[
                # Resident across the block's tile run.
                pl.BlockSpec((1, CHUNK, grad_tables._DF),
                             lambda s, runs, items, dma: (runs[s], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n_planes, pix),
                             lambda s, runs, items, dma: (dma[s], 0, 0),
                             memory_space=pltpu.VMEM),
                # Aliased zeros: a run whose mandatory slot is truncated by
                # the static slot budget (incoherent draw order past the 8x
                # slack) keeps zero gradients instead of decoding
                # uninitialised memory.
                pl.BlockSpec((1, CHUNK, d_out),
                             lambda s, runs, items, dma: (runs[s], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, CHUNK, d_out),
                                   lambda s, runs, items, dma: (runs[s], 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        face_grads = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (batch * num_blocks, CHUNK, d_out), jnp.float32),
            input_output_aliases={5: 0},
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(slot_run, slot_item, slot_dma, face_table, planes,
          jnp.zeros((batch * num_blocks, CHUNK, d_out), jnp.float32))

    # Rows map 1:1 to faces in table order (block nb, offset j ->
    # row_face[nb*CHUNK+j]; the identity when spatial sorting is off);
    # padded tail rows are zero (their face slots have empty bboxes, so no
    # tile lists them) and scatter harmlessly into vertex 0.
    face_grads = face_grads.reshape(
        batch, num_blocks * CHUNK, 3, d_out // 3)
    pad_faces = num_blocks * CHUNK - num_faces
    faces_padded = jnp.pad(faces, ((0, 0), (0, pad_faces), (0, 0)))
    if forward_blocks.SPATIAL:
        faces_padded = jnp.take_along_axis(
            faces_padded, row_face[:, :, None], axis=1)
    batch_offsets = (jnp.arange(batch, dtype=jnp.int32)
                     * num_vertices)[:, None, None]
    seg = (faces_padded + batch_offsets).reshape(-1)
    grad_vertices, grad_vertex_colors = grad_dense.scatter_face_grads(
        face_grads, seg, batch, num_vertices, channels, parts)
    debug = backward.debug_image(dilated, grad_pixels)
    return backward.RasteriseGrads(
        grad_background, grad_vertices, grad_vertex_colors, debug)
