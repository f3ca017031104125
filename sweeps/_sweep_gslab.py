"""Device A/B for the slab-sequential gradient reduction
(DIRT_TPU_GRAD_SLAB, round 4) -- the gradient twin of _sweep_slab.py.

chunk_sums keeps ~6 live [CHUNK, PIX] planes (~768 vregs at the
production 128x1024 partition), far over the vector register file; S-row
slabs cap the live set at [S, PIX].  Unlike the forward slab, this one
is bitwise-identical BY CONSTRUCTION (each face row's reduction is
independent), so the fused/slot cross-check is untouched.  The risk side
is the multiplied per-slab reduction tails (16x the cross-lane shuffle
sequences at S=8); this A/B decides which effect wins.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_gslab
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import backward, dispatch, grad_dense
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
    print(f"=== grad, {faces.shape[1]} faces ===", flush=True)
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces))(clip)
    gp = weights
    ref = None

    def bwd_runner(length):
        def run(c0, gp0, v, f, p, a, s=grad_dense.SLAB):
            del s  # closure tag: distinct jit per SLAB value
            def body(c, _):
                g = backward.rasterise_grad_batch(
                    v, f, p, gp0 + 1e-20 * c, a, implementation="blocks")
                feedback = (jnp.sum(g.grad_background)
                            + jnp.sum(g.grad_vertices)
                            + jnp.sum(g.grad_vertex_colors))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    for slab in slabs:
        grad_dense.SLAB = slab
        tag = f"gslab{slab or 'OFF'}"
        g = jax.jit(lambda v, s=slab: backward.rasterise_grad_batch(
            v, faces, px, gp, aux, implementation="blocks"))(clip)
        cur = tuple(np.asarray(x) for x in
                    (g.grad_background, g.grad_vertices,
                     g.grad_vertex_colors))
        if ref is None:
            ref, ptag = cur, "ref"
        else:
            same = all(np.array_equal(x, y) for x, y in zip(ref, cur))
            ptag = "BIT-EXACT" if same else "PARITY-FAIL"
        ms = slope_time(bwd_runner, jnp.float32(0.0),
                        (gp, clip, faces, px, aux), tag, iters)
        print(f"bwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag})", flush=True)
    grad_dense.SLAB = 0


if __name__ == "__main__":
    probe(64, [0, 8, 16, 32], iters=100)
    probe(256, [0, 8], iters=60)
    probe(1024, [0, 8, 16], iters=20)
    print("done", flush=True)
