"""Device A/B for the resident VMEM table mode of the fused-CSR kernels
(DIRT_TPU_BLOCKS_RESIDENT_MB / DIRT_TPU_GRAD_RESIDENT_MB, round 4).

Motivation (sweeps/_probe_visits.py + _sweep_group.py round-4 numbers):
the fused forward spends ~2.3-3.3 us per [64, 512] visit against a
~0.7-1.3 us op-count floor, and the gradient is bound by per-visit
reduction tails.  Both kernels stream their per-visit block (face table
slice / plane tile) through a manual DMA start + semaphore wait even
when the WHOLE per-image table fits VMEM (bench config: ~300 KB forward
table, 4 MB gradient plane stack).  Resident mode rides the table on a
per-image VMEM BlockSpec (one pipeline fetch per image, amortised over
its grid steps) and indexes blocks dynamically in-kernel -- no per-visit
DMA at all.  Output is bit-exact by construction (identical sweep
expression tree and visit order); verified bitwise on CPU for both
passes, re-verified on device in-run below (trap rule: any new kernel
pattern must be parity-checked on device at multi-chunk/multi-tile
scale -- dynamic-index VMEM reads are such a pattern).

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_resident
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import backward, dispatch, forward_blocks, grad_blocks
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

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a, m=forward_blocks.RESIDENT_MB):
            del m  # closure tag: distinct jit per RESIDENT_MB value
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    def bwd_runner(px, aux):
        def make(length):
            def run(c0, gp0, v, f, m=grad_blocks.RESIDENT_MB):
                del m  # closure tag
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
        return make

    # Forward pass A/B + bitwise parity.
    fref = None
    for mb, tag in [(-1.0, "dma"), (1000.0, "resident")]:
        forward_blocks.RESIDENT_MB = mb
        p, a = jax.jit(lambda c, m=mb: dispatch.forward_batch(
            bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
        cur = (np.asarray(p), np.asarray(a.face_index))
        if fref is None:
            fref, ptag = cur, "ref"
        else:
            same = all(np.array_equal(x, y) for x, y in zip(fref, cur))
            ptag = "BIT-EXACT" if same else "PARITY-FAIL"
        ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                        f"fwd-{tag}", iters)
        print(f"fwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag})", flush=True)
    forward_blocks.RESIDENT_MB = -1.0

    # Gradient pass A/B + bitwise parity vs DMA + relerr vs XLA.
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces))(clip)
    gp = weights
    gx = jax.jit(lambda v: backward.rasterise_grad_batch(
        v, faces, px, gp, aux, implementation="xla"))(clip)
    gx = tuple(np.asarray(x) for x in
               (gx.grad_background, gx.grad_vertices, gx.grad_vertex_colors))
    gref = None
    for mb, tag in [(-1.0, "dma"), (1000.0, "resident")]:
        grad_blocks.RESIDENT_MB = mb
        g = jax.jit(lambda v, m=mb: backward.rasterise_grad_batch(
            v, faces, px, gp, aux, implementation="blocks"))(clip)
        cur = tuple(np.asarray(x) for x in
                    (g.grad_background, g.grad_vertices,
                     g.grad_vertex_colors))
        rel = max(
            float(np.abs(c - x).max() / (np.abs(x).max() + 1e-30))
            for c, x in zip(cur, gx))
        if gref is None:
            gref, ptag = cur, "ref"
        else:
            same = all(np.array_equal(x, y) for x, y in zip(gref, cur))
            ptag = "BIT-EXACT" if same else "PARITY-FAIL"
        ms = slope_time(bwd_runner(px, aux), jnp.float32(0.0),
                        (gp, clip, faces), f"bwd-{tag}", iters)
        print(f"bwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag}, relerr-vs-xla {rel:.1e})", flush=True)
    grad_blocks.RESIDENT_MB = -1.0


if __name__ == "__main__":
    probe(64, iters=100)
    probe(256, iters=60)
    probe(1024, iters=20)
    print("done", flush=True)
