"""Device A/B for the gradient fused-CSR partition (TILE_H x CHUNK,
round 4) at 512/2048/8192 faces.

Motivation: the gradient kernel is LANE-bound (bwd 1.91 ms at the bench
config vs a ~0.8-1.8 ms op-count floor), and the CPU schedule probe
shows finer partitions cut swept lanes hard -- t4 c64 is -38% lanes at
512 faces and -29% at 8192 vs the production t8 c128 (visits rise 2.5x,
but visits are in-kernel loop iterations, and the round-4 depth-4 DMA
rotation hides the transfer).  The round-3 sweep that picked t8/c128
predates both the depth pipeline and the contiguous build_runs.

Gradient VALUES shift with the partition (summation order is
partition-sensitive by design); parity is gated vs the XLA path.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_gtile
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


def probe(segments, variants, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== grad partition, {faces.shape[1]} faces ===", flush=True)
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces))(clip)
    gp = weights
    g_xla = jax.jit(lambda v, p, g: backward.rasterise_grad_batch(
        v, faces, p, g, aux, implementation="xla"))(clip, px, gp)

    def bwd_runner(length):
        def run(c0, gp0, v, f, p, a):
            def body(c, _):
                g = backward.rasterise_grad_batch(
                    v, f, p, gp0 + 1e-20 * c, a, implementation="blocks")
                feedback = (jnp.sum(g.grad_background)
                            + jnp.sum(g.grad_vertices)
                            + jnp.sum(g.grad_vertex_colors))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    grad_blocks.FUSED = True
    for th, c in variants:
        grad_blocks.TILE_H = th
        grad_blocks.CHUNK = c
        tag = f"t{th or 'auto'} c{c}"
        g = jax.jit(lambda v, p, g_: backward.rasterise_grad_batch(
            v, faces, p, g_, aux, implementation="blocks"))(clip, px, gp)
        worst = 0.0
        for name in ("grad_background", "grad_vertices",
                     "grad_vertex_colors"):
            a = np.asarray(getattr(g_xla, name))
            b = np.asarray(getattr(g, name))
            scale = max(np.abs(a).max(), 1.0)
            worst = max(worst, float(np.abs(a - b).max() / scale))
        ptag = f"relerr-vs-xla {worst:.2e}" + (
            " PARITY-FAIL" if worst > 1e-5 else "")
        ms = slope_time(bwd_runner, jnp.float32(0.0),
                        (gp, clip, faces, px, aux), tag, iters)
        print(f"bwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag})", flush=True)
    grad_blocks.TILE_H = 0
    grad_blocks.CHUNK = 128


if __name__ == "__main__":
    probe(64, [(8, 128), (4, 128), (4, 64), (2, 64)], iters=100)
    probe(256, [(8, 128), (4, 64)], iters=60)
    probe(1024, [(8, 128), (4, 64), (4, 128)], iters=20)
    print("done", flush=True)
