"""Device A/B: fine face chunks UNDER forward resident mode (round 4).

The resident A/B (_sweep_resident.py) proved per-visit DMA WAIT is ~zero
under the depth-4 pipeline, leaving two candidate costs for the round-3
fine-chunk losses (c32 +12% at 8192): per-visit DMA-START scalar-core
work, or lane-proportional compute that fine chunks simply don't save
(uniform block liveness).  Resident mode has NO per-visit DMA at all, so
if c32 still loses here the fine-chunk question is closed for good: the
visit overhead is intrinsic (loop/index/merge work), not transport.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_resident2
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

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a,
                tag=(forward_blocks.RESIDENT_MB, forward_blocks.CHUNK)):
            del tag  # closure tag: distinct jit per variant
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    saved = forward_blocks.RESIDENT_MB, forward_blocks.CHUNK
    fref = None
    try:
        for mb, ck, tag in variants:
            forward_blocks.RESIDENT_MB = mb
            forward_blocks.CHUNK = ck
            p, a = jax.jit(lambda c, t=(mb, ck): dispatch.forward_batch(
                bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
            cur = (np.asarray(p), np.asarray(a.face_index))
            if fref is None:
                fref, ptag = cur, "ref"
            else:
                same = all(np.array_equal(x, y) for x, y in zip(fref, cur))
                ptag = "BIT-EXACT" if same else "PARITY-FAIL"
            ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                            tag, iters)
            print(f"fwd {tag}: {ms if ms is None else round(ms, 2)} ms "
                  f"({ptag})", flush=True)
    finally:
        forward_blocks.RESIDENT_MB, forward_blocks.CHUNK = saved


VARIANTS = [
    (-1.0, 0, "c64-dma (prod)"),
    (1000.0, 32, "c32-res"),
    (1000.0, 16, "c16-res"),
    (-1.0, 32, "c32-dma"),
]

if __name__ == "__main__":
    probe(64, VARIANTS, iters=100)
    probe(256, VARIANTS, iters=60)
    probe(1024, VARIANTS, iters=20)
    print("done", flush=True)
