"""Device A/B for the accumulate-then-reduce gradient schedule
(DIRT_TPU_GRAD_ACCUM, round 4).

VERDICT (recorded in BASELINE.md): LOST at every size; the feature was
REMOVED from grad_blocks.py, so this script is provenance only and no
longer runs against HEAD.

The round-4 partition A/B (BASELINE.md) showed t4/c128 matching t8/c128
despite -22% swept lanes: ~half the per-visit cost is lane-INdependent
-- the d_out cross-lane PIX-reduction tails.  ACCUM hoists them out of
the visit loop: visits ADD [CHUNK, PIX] product planes into a VMEM
accumulator (lane-proportional only) and the reduction runs once per
block.  Float summation is reassociated (visits-then-pix), so parity is
relerr-vs-xla, not bitwise-vs-slot.  If ACCUM wins, the t4 partition
(half the lanes) becomes interesting again -- measured here too.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_gaccum
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import backward, dispatch, grad_blocks
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


VARIANTS = [
    # (accum, tile_h, chunk, tag)
    (False, 0, 0, "base t8c128"),
    (True, 0, 0, "accum t8c128"),
    (True, 4, 0, "accum t4c128"),
    (True, 4, 64, "accum t4c64"),
]


def probe(segments, variants, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== grad, {faces.shape[1]} faces ===", flush=True)
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces))(clip)
    gp = weights
    gx = jax.jit(lambda v: backward.rasterise_grad_batch(
        v, faces, px, gp, aux, implementation="xla"))(clip)
    gx = tuple(np.asarray(x) for x in
               (gx.grad_background, gx.grad_vertices, gx.grad_vertex_colors))

    def bwd_runner(length):
        def run(c0, gp0, v, f,
                tag=(grad_blocks.ACCUM, grad_blocks.TILE_H,
                     grad_blocks.CHUNK, grad_blocks.RESIDENT_MB)):
            del tag  # closure tag: distinct jit per variant
            def body(c, _):
                g = backward.rasterise_grad_batch(
                    v, f, px, gp0 + 1e-20 * c, aux,
                    implementation="blocks")
                feedback = (jnp.sum(g.grad_background)
                            + jnp.sum(g.grad_vertices)
                            + jnp.sum(g.grad_vertex_colors))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    saved = (grad_blocks.ACCUM, grad_blocks.TILE_H, grad_blocks.CHUNK,
             grad_blocks.RESIDENT_MB)
    try:
        grad_blocks.RESIDENT_MB = 1000.0
        for accum, th, ck, tag in variants:
            grad_blocks.ACCUM = accum
            grad_blocks.TILE_H = th
            if ck:
                grad_blocks.CHUNK = ck
            g = jax.jit(lambda v, t=(accum, th, ck): backward.
                        rasterise_grad_batch(v, faces, px, gp, aux,
                                             implementation="blocks"))(clip)
            cur = tuple(np.asarray(x) for x in
                        (g.grad_background, g.grad_vertices,
                         g.grad_vertex_colors))
            rel = max(
                float(np.abs(c - x).max() / (np.abs(x).max() + 1e-30))
                for c, x in zip(cur, gx))
            ms = slope_time(bwd_runner, jnp.float32(0.0),
                            (gp, clip, faces), tag, iters)
            print(f"bwd {tag}: {ms if ms is None else round(ms, 2)} ms "
                  f"(relerr-vs-xla {rel:.1e})", flush=True)
            grad_blocks.CHUNK = saved[2]
    finally:
        (grad_blocks.ACCUM, grad_blocks.TILE_H, grad_blocks.CHUNK,
         grad_blocks.RESIDENT_MB) = saved


if __name__ == "__main__":
    probe(64, VARIANTS, iters=100)
    probe(256, VARIANTS, iters=60)
    probe(1024, VARIANTS, iters=20)
    print("done", flush=True)
