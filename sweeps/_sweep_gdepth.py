"""Device A/B for the gradient fused-CSR DMA pipeline depth
(DIRT_TPU_GRAD_BLOCKS_DEPTH, round 4) at 512/2048/8192 faces.

The gradient fused kernel streams [np_dma, pix] plane tiles (64 KB at the
bench partition) per (block, tile) visit; with the round-3 double buffer
the wait is hidden only when the reduction outlasts the DMA.  This
measures depth 2 vs 4 (and 8 in the dense-face regime), with device
parity vs the XLA path per variant.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_gdepth
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


def probe(segments, depths, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== grad, {faces.shape[1]} faces ===", flush=True)
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
    for d in depths:
        grad_blocks.DEPTH = d
        g = jax.jit(lambda v, p, g_: backward.rasterise_grad_batch(
            v, faces, p, g_, aux, implementation="blocks"))(clip, px, gp)
        worst = 0.0
        for name in ("grad_background", "grad_vertices",
                     "grad_vertex_colors"):
            a = np.asarray(getattr(g_xla, name))
            b = np.asarray(getattr(g, name))
            scale = max(np.abs(a).max(), 1.0)
            worst = max(worst, float(np.abs(a - b).max() / scale))
        tag = f"relerr-vs-xla {worst:.2e}" + (
            " PARITY-FAIL" if worst > 1e-5 else "")
        ms = slope_time(bwd_runner, jnp.float32(0.0),
                        (gp, clip, faces, px, aux), f"bwd d{d}", iters)
        print(f"bwd blocks-fused depth={d}: "
              f"{ms if ms is None else round(ms, 2)} ms ({tag})", flush=True)
    grad_blocks.DEPTH = 0


if __name__ == "__main__":
    probe(64, (2, 4), iters=100)
    probe(256, (2, 4), iters=60)
    probe(1024, (2, 4, 8), iters=20)
    print("done", flush=True)
