"""Device A/B for the tile-grouped, depth-pipelined fused-CSR forward
(DIRT_TPU_BLOCKS_GROUP / DIRT_TPU_BLOCKS_DEPTH, round 4).

Motivation (sweeps/_probe_visits.py + round-3 fixed-cost data): at the
bench config the fused forward pays 2048 one-tile grid steps (~1 us each)
against only ~900 visits, so the grid-step fixed cost dominates; in the
dense-face regime (8192 faces) the per-visit time (~2.7 us) is ~4x the
sweep compute (~0.6 us), i.e. DMA-latency-bound at double buffering.
Grouping G tiles per grid step amortises the former; depth-slot rotation
attacks the latter.  Output must stay bit-exact vs the ungrouped schedule
(same sweep expression tree per tile, register-carried state).

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_group
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import dispatch, forward_blocks
import bench as B

REPEATS = 5


def slope_time(make_runner, seed_arg, scene, tag, iters):
    short_fn = make_runner(iters)
    long_fn = make_runner(3 * iters)
    B.drain(short_fn(seed_arg, *scene))
    B.drain(long_fn(seed_arg, *scene))
    for attempt in range(3):
        base = 1e-6 * (10 ** attempt)

        def timed(fn, offs):
            times = []
            for k in offs:
                t0 = time.perf_counter()
                B.drain(fn(seed_arg + base * k, *scene))
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


def probe(segments, variants, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== {faces.shape[1]} faces ===", flush=True)
    forward_blocks.FUSED = True
    ref = None

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a):
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    for th, g, d in variants:
        forward_blocks.TILE_H = th
        forward_blocks.GROUP = g
        forward_blocks.DEPTH = d
        tag = f"t{th or 'auto'} g{g} d{d}"
        p, a = jax.jit(lambda c: dispatch.forward_batch(
            bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
        cur = (np.asarray(p), np.asarray(a.face_index))
        if ref is None:
            ref, ptag = cur, "ref"
        else:
            # Bitwise only at equal tile partitions; across tile heights
            # visibility stays exact, pixel rounding may differ.
            same = all(np.array_equal(x, y) for x, y in zip(ref, cur))
            vis = np.array_equal(ref[1], cur[1])
            ptag = ("BIT-EXACT" if same
                    else "VIS-EXACT" if vis else "PARITY-FAIL")
        ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                        tag, iters)
        print(f"fwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag})", flush=True)
    forward_blocks.TILE_H = 0
    forward_blocks.GROUP = 0
    forward_blocks.DEPTH = 0


if __name__ == "__main__":
    # g1 d2 = the round-3 schedule (baseline); auto = g8 d4.
    probe(64, [(4, 1, 2), (4, 8, 4), (4, 16, 4), (4, 8, 2),
               (2, 16, 4)], iters=100)
    probe(256, [(4, 1, 2), (4, 8, 4), (4, 16, 4)], iters=60)
    probe(1024, [(4, 1, 2), (4, 8, 4), (4, 8, 8), (4, 16, 8)], iters=20)
    print("done", flush=True)
