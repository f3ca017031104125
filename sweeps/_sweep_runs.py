"""Device A/B for the sort-free build_runs (round 5).

build_runs' stable argsort (hits first) is replaceable by a cumsum-rank
scatter producing a bitwise-identical slot list (forward_blocks, flag
DIRT_TPU_RUNS_SORTFREE; pinned in tests/test_hit_kernel.py).  Round 3's
"sort-free packs LOSE" verdict was about the dense kernel's per-tile id
lists at [T, rows, NCK] scale -- this [R, I] ranking is a different
shape, so it gets its own measurement.  Arms: the cumulative pack stage
(table+order+hit(HIT_PALLAS)+runs) and the full step, flag off/on.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_runs
"""
import statistics
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu.ops import forward_blocks, forward_pallas
import bench as B

REPEATS = 5


def slope_time(make_runner, seed, scene, tag, iters):
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

    def pack_runner(flag):
        def make(length):
            forward_blocks.RUNS_SORTFREE = flag

            def one(v, c, f):
                fd = forward_pallas._face_table(v, c, f, height, width, pad)
                order = forward_blocks.spatial_order(
                    fd, (20, 21, 22, 23), tile_h, tile_w)
                fd = jnp.take(fd, order, axis=0)
                hit = forward_blocks.hit_matrix(
                    fd, (20, 21, 22, 23), num_blocks, chunk,
                    tiles_y, tiles_x, tile_h, tile_w,
                    edge_cols=0, height=height, width=width)
                s0, s1, s2, d = forward_blocks.build_runs(hit, num_slots)
                return jnp.sum(fd[:1, :1]) + jnp.float32(jnp.sum(s2[:1]))

            def run(c0, col, f, tag=flag):
                del tag
                def body(c, _):
                    fb = jnp.sum(jax.vmap(one)(c, col, f))
                    return c + 1e-20 * fb, ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)
        return make

    def loss(c, col, bgv, f, w):
        return jnp.sum(dirt_tpu.rasterise_batch(bgv, c, col, f) * w)

    def step_runner(flag):
        def make(length):
            forward_blocks.RUNS_SORTFREE = flag
            grad_fn = jax.grad(loss, argnums=(0, 1, 2))

            def run(c0, col, bgv, f, w, tag=flag):
                del tag
                def body(c, _):
                    g, _, _ = grad_fn(c, col, bgv, f, w)
                    return c + 1e-20 * g, ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)
        return make

    results = {}
    arms = [("pack-sort", pack_runner(False), (colors, faces), 200),
            ("pack-free", pack_runner(True), (colors, faces), 200),
            ("step-sort", step_runner(False), (colors, bg, faces, weights), 30),
            ("step-free", step_runner(True), (colors, bg, faces, weights), 30)]
    for rep in range(2):
        for tag, runner, scene, iters in arms:
            ms = slope_time(runner, clip, scene, tag, iters)
            print(f"{tag}: {ms if ms is None else round(ms, 3)} ms",
                  flush=True)
            if ms is not None:
                results.setdefault(tag, []).append(ms)
    for pair in (("pack-sort", "pack-free"), ("step-sort", "step-free")):
        if all(p in results for p in pair):
            old = statistics.median(results[pair[0]])
            new = statistics.median(results[pair[1]])
            print(f"  median {pair[0]} {round(old, 3)} -> {pair[1]} "
                  f"{round(new, 3)} ms ({(old - new) / old:+.1%})",
                  flush=True)


if __name__ == "__main__":
    main()
    print("done", flush=True)
