"""Per-stage profile of the production step at HEAD (bench config).

Measures, with the hardened slope harness: the forward pass alone, the
gradient pass alone, the full fwd+bwd step, the forward XLA pack (face
table + binning + CSR build) alone, and the backward grad_prepass alone.
The stage split decides where the next round of kernel work goes.

Usage (repo root, TPU env untouched):  python _profile_head.py
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

import os as _os
# NEVER share a compile-cache dir between the axon and cpu platforms (see
# CLAUDE.md): pick by the platform actually in use.
_cache = ('/tmp/dirt_tpu_jax_cache_cpu'
          if _os.environ.get('JAX_PLATFORMS') == 'cpu'
          else '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_compilation_cache_dir', _cache)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu.ops import backward, dispatch, forward_blocks, grad_blocks
from dirt_tpu.ops import grad_tables, forward_pallas
import bench as B

REPEATS = 5


def slope_time(make_runner, seed, scene, tag, iters=20):
    # The scan must be long enough that per-step work dominates the constant
    # dispatch + drain-transfer overhead, or the honest slope itself falls
    # under the 0.3 * t_short plausibility floor: fast stages need hundreds
    # of iterations now that every timed call pays a ~30 ms drain.
    short_fn, long_fn = make_runner(iters), make_runner(3 * iters)
    B.drain(short_fn(seed, *scene))
    B.drain(long_fn(seed, *scene))
    for attempt in range(3):
        base = 1e-6 * (10 ** attempt)

        def timed(fn, offs):
            times = []
            for k in offs:
                t0 = time.perf_counter()
                B.drain(fn(seed + base * k, *scene))
                times.append(time.perf_counter() - t0)
            return statistics.median(times)

        t_s = timed(short_fn, range(1, REPEATS + 1))
        t_l = timed(long_fn, range(REPEATS + 1, 2 * REPEATS + 1))
        slope = t_l - t_s
        if slope > 0 and slope >= 0.3 * t_s:
            return slope * 1e3 / (2 * iters)
        print(f"  [{tag}] implausible slope; retry", flush=True)
    print(f"  [{tag}] TIMING FAILED", flush=True)
    return None


def main():
    import os
    batch = int(os.environ.get("DIRT_BENCH_BATCH", "16"))
    res = int(os.environ.get("DIRT_BENCH_RES", "256"))
    segments = int(os.environ.get("DIRT_BENCH_SEGMENTS", "64"))
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    num_faces = faces.shape[1]
    height = width = res

    # --- full step (production auto path, same shape as bench.py) ---
    def loss(c, col, bgv, f, w):
        return jnp.sum(dirt_tpu.rasterise_batch(bgv, c, col, f) * w)
    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    def step_runner(length):
        def run(c0, col, bgv, f, w):
            def body(c, _):
                g, _, _ = grad_fn(c, col, bgv, f, w)
                return c + 1e-20 * g, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    scene = (colors, bg, faces, weights)
    ms = slope_time(step_runner, clip, scene, "step", iters=20)
    print(f"full fwd+bwd step: {ms and round(ms, 2)} ms", flush=True)

    # --- forward alone ---
    def fwd_runner(length):
        def run(c0, col, bgv, f, w):
            def body(c, _):
                p, _ = dispatch.forward_batch(bgv, c, col, f)
                return c + 1e-20 * jnp.sum(p * w), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    ms = slope_time(fwd_runner, clip, scene, "fwd", iters=40)
    print(f"forward (auto=blocks fused): {ms and round(ms, 2)} ms", flush=True)

    # --- backward alone (fixed aux from one forward) ---
    px, aux = jax.jit(lambda c: dispatch.forward_batch(bg, c, colors, faces))(
        clip)

    def bwd_runner(length):
        # SCALAR carry: the drain transfer must move bytes, not a 12.6 MB
        # cotangent (relay transfer jitter defeats the slope gate), and the
        # feedback must consume EVERY output or XLA dead-code-eliminates
        # the kernel work inside the scan.
        def run(c0, gp0, v, f, p, a):
            def body(c, _):
                g = backward.rasterise_grad_batch(v, f, p, gp0 + 1e-20 * c, a)
                feedback = (jnp.sum(g.grad_background)
                            + jnp.sum(g.grad_vertices)
                            + jnp.sum(g.grad_vertex_colors))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    ms = slope_time(bwd_runner, jnp.float32(0.0),
                    (weights, clip, faces, px, aux), "bwd", iters=40)
    print(f"backward (auto=blocks fused): {ms and round(ms, 2)} ms",
          flush=True)

    # --- forward pack alone (face table + hit matrix + CSR runs) ---
    tile_h, tile_w = forward_blocks.tile_h_for(), forward_blocks.TILE_W
    chunk = forward_blocks.chunk_for()
    num_blocks = -(-num_faces // chunk)
    tiles_y = -(-height // tile_h)
    tiles_x = -(-width // tile_w)
    num_slots = forward_blocks.slots_per_image(tiles_y * tiles_x, num_blocks)

    def pack_runner(length):
        def pack_one(v, c, f):
            fd = forward_pallas._face_table(
                v, c, f, height, width, num_blocks * chunk - num_faces)
            hit = forward_blocks.hit_matrix(
                fd, (20, 21, 22, 23), num_blocks, chunk,
                tiles_y, tiles_x, tile_h, tile_w,
                edge_cols=0, height=height, width=width)
            t = fd.reshape(num_blocks, chunk, -1)
            return t, *forward_blocks.build_runs(hit, num_slots)

        def run(c0, col, bgv, f, w):
            def body(c, _):
                t, s0, s1, s2, d = jax.vmap(pack_one)(c, col, f)
                feedback = (jnp.sum(t[:, :1, :1, :1])
                            + jnp.float32(jnp.sum(s2[:, :1])))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    ms = slope_time(pack_runner, clip, scene, "pack", iters=200)
    print(f"forward pack (table+hit+runs): {ms and round(ms, 2)} ms",
          flush=True)

    # --- grad prepass alone (Scharr + dilation + plane build) ---
    def pre_runner(length):
        # Scalar carry (drain-transfer size) + feedback over every product
        # (defeat dead-code elimination), as for bwd_runner.
        def run(c0, gp0, p, a):
            def body(c, _):
                pre = backward.grad_prepass(p, gp0 + 1e-20 * c, a)
                feedback = jnp.sum(
                    pre.ax + pre.ay + pre.px_t + pre.py_t
                    + jnp.sum(pre.bary_d, -1)
                    + pre.face_d.astype(jnp.float32)
                    + jnp.sum(pre.bary_pre, -1)
                    + pre.face_pre.astype(jnp.float32)
                    + jnp.sum(pre.grad_background, -1))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    ms = slope_time(pre_runner, jnp.float32(0.0), (weights, px, aux),
                    "prepass", iters=200)
    print(f"grad prepass (Scharr+dilate): {ms and round(ms, 2)} ms",
          flush=True)

    # --- grad pack alone (grad face table + transposed CSR) ---
    g_tile_h = grad_blocks.tile_h_for(num_faces)
    g_chunk = grad_blocks.CHUNK
    g_blocks = -(-num_faces // g_chunk)
    g_ty = -(-height // g_tile_h)
    g_tx = -(-width // grad_blocks.TILE_W)
    g_slots = forward_blocks.slots_per_image(g_blocks, g_ty * g_tx)

    def gpack_runner(length):
        def pack_one(v, f):
            fd = grad_tables._grad_face_table(
                v, f, height, width, g_blocks * g_chunk - num_faces)
            hit = forward_blocks.hit_matrix(
                fd, (0, 1, 2, 3), g_blocks, g_chunk,
                g_ty, g_tx, g_tile_h, grad_blocks.TILE_W,
                edge_cols=12, height=height, width=width, dilate=1)
            t = fd.reshape(g_blocks, g_chunk, -1)
            return t, *forward_blocks.build_runs(hit.T, g_slots)

        def run(c0, f):
            def body(c, _):
                t, s0, s1, s2, d = jax.vmap(pack_one)(c, f)
                feedback = (jnp.sum(t[:, :1, :1, :1])
                            + jnp.float32(jnp.sum(s2[:, :1])))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    ms = slope_time(gpack_runner, clip, (faces,), "gpack", iters=200)
    print(f"grad pack (table+hit+runs): {ms and round(ms, 2)} ms", flush=True)


if __name__ == "__main__":
    main()
