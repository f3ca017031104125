"""Device A/B for the slab-sequential chunk sweep
(DIRT_TPU_SWEEP_SLAB, round 4).

Motivation (sweeps/_probe_visits.py round-4 numbers): the fused forward
is SWEEP-COMPUTE-bound at 2.3-3.3 us per [64, 512] visit against a
0.7-1.3 us op-count floor.  The full-chunk sweep keeps ~10 live
[CHUNK, PIX] planes (~320 vregs at 64x512) -- far over the vector
register file -- so Mosaic must spill intermediates to VMEM.  Sweeping
the chunk in S-row slabs merged through merge_state keeps the live set
at [S, PIX] (S=8 -> 4 vregs per plane) at the cost of a tiny [1, PIX]
merge per slab.  Output is bitwise-identical (lexicographic-min
reassociation; verified in-run below AND on CPU for slab 8/16).

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_slab
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import dispatch, forward_blocks, forward_dense
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


def probe(segments, slabs, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== {faces.shape[1]} faces ===", flush=True)
    forward_blocks.FUSED = True
    ref = None

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a, s=forward_dense.SLAB):
            del s  # closure tag: force a distinct jit per SLAB value
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run, static_argnames="s")

    for slab in slabs:
        forward_dense.SLAB = slab
        tag = f"slab{slab or 'OFF'}"
        p, a = jax.jit(lambda c, s=slab: dispatch.forward_batch(
            bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
        cur = (np.asarray(p), np.asarray(a.face_index))
        if ref is None:
            ref, ptag = cur, "ref"
        else:
            same = all(np.array_equal(x, y) for x, y in zip(ref, cur))
            ptag = "BIT-EXACT" if same else "PARITY-FAIL"
        ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                        tag, iters)
        print(f"fwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag})", flush=True)
    forward_dense.SLAB = 0


if __name__ == "__main__":
    probe(64, [0, 8, 16, 32], iters=100)
    probe(256, [0, 8, 16], iters=60)
    probe(1024, [0, 8, 16], iters=20)
    print("done", flush=True)
