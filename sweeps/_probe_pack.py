"""Pack-internals probe: where do the forward/gradient pack milliseconds go?

The HEAD stage split (round 5: step 3.91 ms = fwd sweep 1.86 + fwd pack
0.33 + grad kernel 1.32 + grad pack 0.22 + prepass 0.22 at the bench
config) leaves the two CSR packs as the largest non-exhausted cost.  This
probe times their internal stages cumulatively (each arm adds one stage)
to locate the dominant slice: face table -> spatial order (Morton argsort
+ take) -> hit matrix (bbox + half-plane cull) -> build_runs (argsort +
scatter).

Usage (repo root, TPU env untouched):  python -m sweeps._probe_pack
"""
import statistics
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import forward_blocks, forward_pallas, grad_blocks, grad_tables
import bench as B

REPEATS = 5


def slope_time(make_runner, seed, scene, tag, iters=200):
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
    batch, res, segments = 16, 256, 64
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    num_faces = faces.shape[1]
    height = width = res

    tile_h, tile_w = forward_blocks.tile_h_for(), forward_blocks.TILE_W
    chunk = forward_blocks.chunk_for()
    num_blocks = -(-num_faces // chunk)
    tiles_y, tiles_x = -(-height // tile_h), -(-width // tile_w)
    num_slots = forward_blocks.slots_per_image(tiles_y * tiles_x, num_blocks)
    pad = num_blocks * chunk - num_faces

    g_tile_h = grad_blocks.tile_h_for(num_faces)
    g_chunk = grad_blocks.CHUNK
    g_blocks = -(-num_faces // g_chunk)
    g_ty, g_tx = -(-height // g_tile_h), -(-width // grad_blocks.TILE_W)
    g_slots = forward_blocks.slots_per_image(g_blocks, g_ty * g_tx)
    g_pad = g_blocks * g_chunk - num_faces

    def fwd_stage(upto):
        def one(v, c, f):
            fd = forward_pallas._face_table(v, c, f, height, width, pad)
            out = [jnp.sum(fd[:1, :1])]
            if upto >= 1 and forward_blocks.SPATIAL:
                order = forward_blocks.spatial_order(
                    fd, (20, 21, 22, 23), tile_h, tile_w)
                fd = jnp.take(fd, order, axis=0)
                out.append(jnp.float32(jnp.sum(order[:1])))
            if upto >= 2:
                hit = forward_blocks.hit_matrix(
                    fd, (20, 21, 22, 23), num_blocks, chunk,
                    tiles_y, tiles_x, tile_h, tile_w,
                    edge_cols=0, height=height, width=width)
                out.append(jnp.float32(jnp.sum(hit[:1, :1])))
            if upto >= 3:
                s0, s1, s2, d = forward_blocks.build_runs(hit, num_slots)
                out.append(jnp.float32(jnp.sum(s2[:1])))
            return sum(out)

        def make(length):
            def run(c0, col, f):
                def body(c, _):
                    fb = jnp.sum(jax.vmap(one)(c, col, f))
                    return c + 1e-20 * fb, ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)
        return make

    def grad_stage(upto):
        def one(v, f):
            fd = grad_tables._grad_face_table(v, f, height, width, g_pad)
            out = [jnp.sum(fd[:1, :1])]
            if upto >= 1 and forward_blocks.SPATIAL:
                order = forward_blocks.spatial_order(
                    fd, (0, 1, 2, 3), g_tile_h, grad_blocks.TILE_W)
                fd = jnp.take(fd, order, axis=0)
                out.append(jnp.float32(jnp.sum(order[:1])))
            if upto >= 2:
                hit = forward_blocks.hit_matrix(
                    fd, (0, 1, 2, 3), g_blocks, g_chunk,
                    g_ty, g_tx, g_tile_h, grad_blocks.TILE_W,
                    edge_cols=12, height=height, width=width, dilate=1)
                out.append(jnp.float32(jnp.sum(hit[:1, :1])))
            if upto >= 3:
                s0, s1, s2, d = forward_blocks.build_runs(hit.T, g_slots)
                out.append(jnp.float32(jnp.sum(s2[:1])))
            return sum(out)

        def make(length):
            def run(c0, col, f):
                del col
                def body(c, _):
                    fb = jnp.sum(jax.vmap(one)(c, f))
                    return c + 1e-20 * fb, ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)
        return make

    names = ["table", "+order", "+hit", "+runs"]
    for label, stage in (("fwd", fwd_stage), ("grad", grad_stage)):
        prev = 0.0
        for upto in range(4):
            ms = slope_time(stage(upto), clip, (colors, faces),
                            f"{label}-{names[upto]}")
            if ms is None:
                break
            print(f"{label} pack {names[upto]:7s}: {ms:5.3f} ms "
                  f"(delta {ms - prev:+.3f})", flush=True)
            prev = ms


if __name__ == "__main__":
    main()
