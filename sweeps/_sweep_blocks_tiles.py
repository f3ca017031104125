"""Tile-height sweep for the FUSED block-binned kernels at mid/large
mesh sizes (on real TPU).

The fused-CSR schedule pays one grid step per (batch, tile) for the
forward -- cheap steps (one output write, no state round trips) -- so
finer tiles, which lost badly for the dense kernels (round-3: ~2 us
fixed cost per chunk-grid step), may now win for tiny-face meshes by
cutting the [CHUNK, PIX] sweep width per visit.  The gradient kernel's
grid is per face block and only its DMA'd plane tiles shrink.

Usage (repo root, TPU env untouched):
    python _sweep_blocks_tiles.py [segments...]
"""
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import backward, dispatch, forward_blocks, grad_blocks
import bench as B

ITERS = 6
REPEATS = 5


def slope_time(make_runner, seed_arg, scene, tag):
    short_fn = make_runner(ITERS)
    long_fn = make_runner(3 * ITERS)
    jax.block_until_ready(short_fn(seed_arg, *scene))
    jax.block_until_ready(long_fn(seed_arg, *scene))
    for attempt in range(3):
        base = 1e-6 * (10 ** attempt)

        def timed(fn, offs):
            times = []
            for k in offs:
                t0 = time.perf_counter()
                jax.block_until_ready(fn(seed_arg + base * k, *scene))
                times.append(time.perf_counter() - t0)
            return statistics.median(times)

        t_s = timed(short_fn, range(1, REPEATS + 1))
        t_l = timed(long_fn, range(REPEATS + 1, 2 * REPEATS + 1))
        slope = t_l - t_s
        if slope > 0 and slope >= 0.3 * t_s:
            return slope * 1e3 / (2 * ITERS)
        print(f"  [{tag}] implausible slope t_s={t_s:.4f} t_l={t_l:.4f}; retry",
              flush=True)
    print(f"  [{tag}] TIMING FAILED", flush=True)
    return None


def probe(segments):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    num_faces = faces.shape[1]
    print(f"=== {num_faces} faces (fused schedules) ===", flush=True)
    forward_blocks.FUSED = True
    grad_blocks.FUSED = True

    ref_idx = None

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a):
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    for th in (32, 16, 8):
        forward_blocks.TILE_H = th
        p, a = jax.jit(lambda c: dispatch.forward_batch(
            bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
        idx = np.asarray(a.face_index)
        if ref_idx is None:
            ref_idx = idx
        tag = "OK" if (idx == ref_idx).all() else "MISMATCH"
        ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                        f"fwd t{th}")
        print(f"fwd blocks-fused t{th}x128: "
              f"{ms if ms is None else round(ms, 2)} ms (idx {tag})",
              flush=True)
    forward_blocks.TILE_H = 32

    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces, dispatch.default_backend(num_faces)))(clip)
    gp = weights
    g_ref = None

    def bwd_runner(length):
        def run(gp0, v_a, f_a, px_a, aux_a):
            def body(gp_c, _):
                g = backward.rasterise_grad_batch(
                    v_a, f_a, px_a, gp_c, aux_a, implementation="blocks")
                return gp_c + 1e-20 * jnp.sum(g.grad_vertices), ()
            return jax.lax.scan(body, gp0, None, length=length)[0]
        return jax.jit(run)

    for th in (16, 8, 4):
        grad_blocks.TILE_H = th
        g = jax.jit(lambda v_a, f_a, p_a, g_a: backward.rasterise_grad_batch(
            v_a, f_a, p_a, g_a, aux, implementation="blocks"))(
            clip, faces, px, gp)
        cur = {n: np.asarray(getattr(g, n)) for n in
               ("grad_vertices", "grad_vertex_colors")}
        if g_ref is None:
            g_ref, tag = cur, "ref"
        else:
            worst = max(
                float(np.abs(a / max(np.abs(a).max(), 1.0)
                             - cur[n] / max(np.abs(a).max(), 1.0)).max())
                for n, a in g_ref.items())
            tag = f"relerr {worst:.1e}" + (
                " PARITY-FAIL" if worst > 1e-5 else "")
        ms = slope_time(bwd_runner, gp, (clip, faces, px, aux), f"bwd t{th}")
        print(f"bwd blocks-fused t{th}x128: "
              f"{ms if ms is None else round(ms, 2)} ms ({tag})", flush=True)
    grad_blocks.TILE_H = 0


if __name__ == "__main__":
    segs = [int(s) for s in sys.argv[1:]] or [64, 256, 1024]
    for s in segs:
        probe(s)
    print("done", flush=True)
