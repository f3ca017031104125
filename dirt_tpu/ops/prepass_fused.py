"""Fused Pallas TPU kernel for the gradient pre-pass.

Computes, per image, everything ops/backward.grad_prepass computes --
Scharr filtering of the forward-rendered pixels, occluder dilation, and
the face-independent viewport chain-rule factors (semantics of the
reference's assemble_grads steps 1/3/4, csrc/rasterise_grad_egl.cu:
113-194,203-208) -- in ONE VMEM-resident pass, and writes the per-pixel
plane stack DIRECTLY in the tile-major layout the block-binned gradient
kernel consumes (ops/grad_dense.chunk_sums plane order).

Why: the XLA pre-pass materialises every shifted neighbour view and
select intermediate in HBM (measured 0.89 ms at the 16x256^2 bench
config against a ~0.12 ms bandwidth floor), and grad_blocks then pays
more HBM passes for the moveaxis/concat/pad/tile-transpose that build
the plane stack.  Fusing both into one kernel turns ~10 full-image HBM
round trips into one read of the inputs and one write of the stack.

Decision-parity with the XLA pre-pass: every dilation decision
(dominant-axis pick, neighbour adoption) uses the same shifted values
and the same exact float comparisons, so the two implementations pick
identical winners wherever their Scharr responses round identically;
interpret mode (CPU tests) shares the jnp expression tree and matches
bitwise.

The whole image must be VMEM-resident (Scharr + dilation read 1-pixel
neighbourhoods, so row tiles would need halo exchange): callers fall
back to the XLA pre-pass when the image does not fit the budget or the
tile grid does not divide it (ops/grad_blocks.py keeps both paths).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_clamped(x, ox, oy):
    """out[r, c] = x[r - oy, c + ox], edge-clamped (backward._shift
    convention: `at(ox, oy)` reads row r - oy, column c + ox)."""
    if oy == 1:       # read row r-1
        x = jnp.concatenate([x[:1], x[:-1]], axis=0)
    elif oy == -1:    # read row r+1
        x = jnp.concatenate([x[1:], x[-1:]], axis=0)
    if ox == -1:      # read col c-1
        x = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    elif ox == 1:     # read col c+1
        x = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    return x


def _shift_fill(x, ox, oy, fill):
    """out[r, c] = x[r - oy, c + ox], `fill` out of bounds (axis-aligned
    offsets only -- the dilation neighbourhood)."""
    assert (ox == 0) != (oy == 0)
    dtype = jnp.asarray(fill, x.dtype).dtype
    if oy == 1:
        row = jnp.full((1, x.shape[1]), fill, dtype)
        return jnp.concatenate([row, x[:-1]], axis=0)
    if oy == -1:
        row = jnp.full((1, x.shape[1]), fill, dtype)
        return jnp.concatenate([x[1:], row], axis=0)
    col = jnp.full((x.shape[0], 1), fill, dtype)
    if ox == -1:
        return jnp.concatenate([col, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], col], axis=1)


def _prepass_kernel(px_ref, gp_ref, *rest,
                    height, width, channels, tile_h, tile_w, np_dma,
                    parts="all", color_channels=0):
    """One grid step per image; all planes [H, W] f32/i32 in VMEM.

    `color_channels` > 0 selects the fused-deferred stack: an extra
    cotangent input follows gp_ref, and the emitted cotangent planes (the
    ones the colour reductions read) come from it instead of gp_ref,
    which still drives the Scharr/viewport position planes
    (grad_dense.prepass_and_planes documents the semantics)."""
    if color_channels:
        (cg_ref, bary_ref, idx_ref, w_ref, face_ref,
         planes_ref, dilated_ref) = rest
    else:
        bary_ref, idx_ref, w_ref, face_ref, planes_ref, dilated_ref = rest
        cg_ref = None
    half_w, half_h = 0.5 * width, 0.5 * height

    # --- Scharr responses per channel (rasterise_grad_egl.cu:113-127) ---
    sx, sy = [], []
    for c in range(channels):
        p = px_ref[0, c]
        at = lambda ox, oy: _shift_clamped(p, ox, oy)
        sx.append((at(-1, -1) + at(-1, +1) - at(+1, -1) - at(+1, +1))
                  * (3. / 32.) + (at(-1, 0) - at(+1, 0)) * (10. / 32.))
        sy.append((at(-1, -1) + at(+1, -1) - at(-1, +1) - at(+1, +1))
                  * (3. / 32.) + (at(0, -1) - at(0, +1)) * (10. / 32.))

    l1_x = functools.reduce(lambda a, b: a + b, [jnp.abs(s) for s in sx])
    l1_y = functools.reduce(lambda a, b: a + b, [jnp.abs(s) for s in sy])
    horizontal = l1_x > l1_y
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    flip = (rows + cols) % 2 == 1
    interior = ((rows > 0) & (rows < height - 1)
                & (cols > 0) & (cols < width - 1))

    # --- Occluder dilation (rasterise_grad_egl.cu:153-194) ---
    # Offsets 0:(+1,0) 1:(-1,0) 2:(0,+1) 3:(0,-1); primary = dominant axis
    # with parity-dithered sign, secondary = the opposite direction.  The
    # second attempt only fires where the first did not adopt, so both
    # compare against the ORIGINAL pixel state.
    def pick(n):        # n: list of the 4 shifted planes
        c1 = jnp.where(horizontal, jnp.where(flip, n[1], n[0]),
                       jnp.where(flip, n[3], n[2]))
        c2 = jnp.where(horizontal, jnp.where(flip, n[0], n[1]),
                       jnp.where(flip, n[2], n[3]))
        return c1, c2

    offs = [(1, 0), (-1, 0), (0, 1), (0, -1)]
    idx = [idx_ref[0, k] for k in range(3)]
    bary = [bary_ref[0, k] for k in range(3)]
    wpl = w_ref[0]
    face = face_ref[0]

    cand_idx = [pick([_shift_fill(x, ox, oy, -1) for ox, oy in offs])
                for x in idx]
    cand_bary = [pick([_shift_fill(x, ox, oy, -1.0) for ox, oy in offs])
                 for x in bary]
    cand_w = pick([_shift_fill(wpl, ox, oy, jnp.inf) for ox, oy in offs])
    cand_face = pick([_shift_fill(face, ox, oy, -1) for ox, oy in offs])

    def adopt(a):       # a = attempt index 0 (primary) / 1 (secondary)
        different = ((cand_idx[0][a] != idx[0]) | (cand_idx[1][a] != idx[1])
                     | (cand_idx[2][a] != idx[2]))
        return (interior & (cand_idx[0][a] != -1) & different
                & (wpl > cand_w[a]))

    cond1 = adopt(0)
    cond2 = adopt(1) & jnp.logical_not(cond1)
    dilated = cond1 | cond2

    def dilate(orig, cand):
        return jnp.where(cond2, cand[1], jnp.where(cond1, cand[0], orig))

    bary_d = [dilate(bary[k], cand_bary[k]) for k in range(3)]
    w_d = dilate(wpl, cand_w)
    face_d = dilate(face, cand_face)

    # --- Viewport chain-rule factors (rasterise_grad_egl.cu:203-208) ---
    covered_d = face_d >= 0
    dl_dx = functools.reduce(
        lambda a, b: a + b, [gp_ref[0, c] * sx[c] for c in range(channels)])
    dl_dy = functools.reduce(
        lambda a, b: a + b, [gp_ref[0, c] * sy[c] for c in range(channels)])
    safe_w = jnp.where(covered_d, w_d, 1.0)
    zero = jnp.zeros((height, width), jnp.float32)
    ax = jnp.where(covered_d, dl_dx * half_w / safe_w, zero)
    ay = jnp.where(covered_d, dl_dy * half_h / safe_w, zero)
    px_t = jnp.where(covered_d, dl_dx * half_w / (safe_w * safe_w), zero)
    py_t = jnp.where(covered_d, dl_dy * half_h / (safe_w * safe_w), zero)

    covered_pre = face >= 0
    f32 = lambda a: a.astype(jnp.float32)
    # Plane order per grad_dense.plane_layout(parts, channels); "position"
    # drops the pre-dilation + cotangent planes its reductions never read
    # (the position values ax/ay/px_t/py_t/bary_d/face_d are the SAME
    # expressions either way, so the subset stack is bitwise-equal to the
    # corresponding slice of the full stack).
    planes = [ax, ay, px_t, py_t, *[f32(b) for b in bary_d], f32(face_d)]
    if parts == "all":
        planes += [*[jnp.where(covered_pre, b, 0.0) for b in bary],
                   f32(face)]
        if color_channels:
            planes += [cg_ref[0, c] for c in range(color_channels)]
        else:
            planes += [gp_ref[0, c] for c in range(channels)]
    planes += [zero] * (np_dma - len(planes))

    # --- Tile-major stack write: each [tile_h, tile_w] slice is one store.
    tiles_y, tiles_x = height // tile_h, width // tile_w
    for p, arr in enumerate(planes):
        for i in range(tiles_y):
            for j in range(tiles_x):
                planes_ref[0, i, j, p] = arr[i * tile_h:(i + 1) * tile_h,
                                             j * tile_w:(j + 1) * tile_w]
    dilated_ref[0] = dilated.astype(jnp.float32)


def supported(height, width, channels, tile_h, tile_w, np_dma,
              color_channels=0):
    """Whole-image VMEM residency + exact tiling are required; callers
    fall back to the XLA pre-pass otherwise."""
    if height % tile_h or width % tile_w:
        return False
    resident = ((3 * channels + color_channels + 10 + np_dma)
                * height * width * 4)
    return resident * 2 <= 48 * 1024 * 1024   # double-buffered pipeline


def plane_stack(pixels, grad_pixels, aux, tile_h, tile_w, np_dma,
                interpret=False, parts="all", color_cotangent=None):
    """Fused pre-pass for a batch.

    Args are the batched gradient inputs ([B, H, W, C] pixels/grad_pixels,
    RasterAux).  Returns (planes [B*T, np_dma, tile_h*tile_w] f32 in
    ops/grad_dense.plane_layout(parts) order, dilated [B, H, W] bool).
    `parts` may be "all" or "position" (the "color" subset needs no
    pre-pass at all -- see grad_dense.prepass_and_planes).
    `color_cotangent` (parts="all" only) emits the fused-deferred stack:
    cotangent planes from it, position planes from pixels/grad_pixels.
    """
    batch, height, width, channels = pixels.shape
    color_channels = (0 if color_cotangent is None
                      else color_cotangent.shape[-1])
    tiles_y, tiles_x = height // tile_h, width // tile_w
    num_tiles = tiles_y * tiles_x

    px_t = jnp.moveaxis(pixels, -1, 1)                  # [B, C, H, W]
    gp_t = jnp.moveaxis(grad_pixels, -1, 1)
    bary_t = jnp.moveaxis(aux.barycentric, -1, 1)       # [B, 3, H, W]
    idx_t = jnp.moveaxis(aux.indices, -1, 1)            # [B, 3, H, W] i32

    kernel = functools.partial(
        _prepass_kernel, height=height, width=width, channels=channels,
        tile_h=tile_h, tile_w=tile_w, np_dma=np_dma, parts=parts,
        color_channels=color_channels)
    img = lambda *trail: pl.BlockSpec(
        (1,) + trail, lambda b: (b,) + (0,) * len(trail),
        memory_space=pltpu.VMEM)
    extra_in = ([jnp.moveaxis(color_cotangent, -1, 1)] if color_channels
                else [])
    extra_spec = ([img(color_channels, height, width)] if color_channels
                  else [])
    planes, dilated = pl.pallas_call(
        kernel,
        grid=(batch,),
        in_specs=[
            img(channels, height, width),
            img(channels, height, width),
            *extra_spec,
            img(3, height, width),
            img(3, height, width),
            img(height, width),
            img(height, width),
        ],
        out_specs=[
            img(tiles_y, tiles_x, np_dma, tile_h, tile_w),
            img(height, width),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, tiles_y, tiles_x, np_dma, tile_h, tile_w),
                jnp.float32),
            jax.ShapeDtypeStruct((batch, height, width), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(px_t, gp_t, *extra_in, bary_t, idx_t, aux.clip_w, aux.face_index)
    planes = planes.reshape(
        batch * num_tiles, np_dma, tile_h * tile_w)
    return planes, dilated > 0.5
