"""Device A/B for the reduced-op coverage test (DIRT_TPU_COVER_FAST, round 4).

Motivation (sweeps/_probe_visits.py round-4 numbers + the resident-mode
finding in BASELINE.md): the fused forward sweep is VPU-ISSUE-bound at
~2.3-3.3 us per [64, 512] visit on its ~100 vector ops/lane; transport
(DMA wait), partition tuning, slab sweeps and fine chunks all failed to
move it.  The remaining lever is fewer ops.  COVER_FAST rewrites the
literal geometry.fragment_cover_depth coverage tree (~40 [CHUNK, PIX]
vector ops) into a reduced boolean form (~28 ops) proven bitwise-equal
in forward_dense._chunk_candidates's comment block:

  * in_n = ~(ok0 | ok1 | ok2) by De Morgan, where ok_i is the spec's own
    positive fill-rule term (NaN rows die on s_w NaN); a select form of
    ok_i would save 3 more ops but Mosaic cannot lower selects on boolean
    planes (arith.trunci i8->i1 unsupported on v5e);
  * the depth-magnitude test |s_z| <= |s_w| distributes out of the
    sign-branch union.

This script is the recorded device A/B behind the default: forward-only
(the gradient kernels never evaluate coverage; they replay the winner
maps), blocks backend (production), bitwise parity asserted per row.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_cover
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


def probe(segments, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== {faces.shape[1]} faces ===", flush=True)
    forward_blocks.FUSED = True
    ref = None

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a, s=forward_dense.COVER_FAST):
            del s  # closure tag: force a distinct jit per flag value
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run, static_argnames="s")

    results = {}
    # Interleave the two arms to cancel relay load drift.
    order = [False, True, False, True]
    for arm in order:
        forward_dense.COVER_FAST = arm
        tag = "fast" if arm else "spec"
        p, a = jax.jit(lambda c, s=arm: dispatch.forward_batch(
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
        if ms is not None:
            results.setdefault(tag, []).append(ms)
    for tag, vals in sorted(results.items()):
        print(f"  median fwd {tag}: {round(statistics.median(vals), 2)} ms "
              f"over {len(vals)} interleaved runs", flush=True)
    forward_dense.COVER_FAST = True


if __name__ == "__main__":
    probe(64, iters=100)
    probe(256, iters=60)
    probe(1024, iters=20)
    print("done", flush=True)
