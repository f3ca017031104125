"""Device A/B for the fused Pallas gradient pre-pass (ops/prepass_fused.py).

Parity first: block-binned gradients with the fused pre-pass vs the XLA
implementation on device (relative error must stay at the usual 3e-7..1e-5
FMA level, and the dilation/decision-dependent values must not blow up).
Then the backward-stage slope time with the pre-pass fused vs XLA.

Usage (repo root, TPU env untouched):  python _sweep_prepass.py
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu.ops import backward, dispatch, grad_blocks
import bench as B

REPEATS = 5


def slope_time(make_runner, seed, scene, tag, iters=40):
    short_fn, long_fn = make_runner(iters), make_runner(3 * iters)
    B.drain(short_fn(seed, *scene))
    B.drain(long_fn(seed, *scene))
    for attempt in range(3):
        base = 1e-6 * (10 ** attempt)

        def timed(fn, offs):
            times = []
            for k in offs:
                t0 = time.perf_counter()
                B.drain(fn(seed + base * k, *scene))
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


def main(segments=64):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces))(clip)
    gp = weights

    # --- Parity on device: fused pre-pass vs the XLA gradient path ---
    g_xla = jax.jit(lambda v, p, g: backward.rasterise_grad_batch(
        v, faces, p, g, aux, implementation="xla"))(clip, px, gp)
    results = {}
    for fused in (False, True):
        grad_blocks.PREPASS = fused
        g = jax.jit(lambda v, p, g_: backward.rasterise_grad_batch(
            v, faces, p, g_, aux, implementation="blocks"))(clip, px, gp)
        worst = 0.0
        for name in ("grad_background", "grad_vertices",
                     "grad_vertex_colors"):
            a = np.asarray(getattr(g_xla, name))
            b = np.asarray(getattr(g, name))
            scale = max(np.abs(a).max(), 1.0)
            worst = max(worst, float(np.abs(a - b).max() / scale))
        results[fused] = worst
        print(f"blocks grad vs xla, fused_prepass={int(fused)}: "
              f"relerr {worst:.2e}"
              + (" PARITY-FAIL" if worst > 1e-5 else ""), flush=True)

    # --- Backward-stage slope time, pre-pass fused vs XLA ---
    # SCALAR scan carry: the drain transfer after each timed call must move
    # a few bytes, not a grad_pixels-sized array (a 12.6 MB relay transfer
    # is jittery enough to defeat the slope gate).  The scalar perturbs the
    # cotangent each iteration, keeping inputs fresh and the loop carried.
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

    for fused in (False, True):
        grad_blocks.PREPASS = fused
        ms = slope_time(bwd_runner, jnp.float32(0.0),
                        (gp, clip, faces, px, aux),
                        f"bwd fused_prepass={int(fused)}")
        print(f"bwd blocks, fused_prepass={int(fused)}: "
              f"{ms if ms is None else round(ms, 2)} ms", flush=True)

    # --- Full-step slope at the production defaults (PREPASS back on) ---
    grad_blocks.PREPASS = True

    def step_runner(length):
        def loss(c, col, bgv, f_, w):
            return jnp.sum(dirt_tpu.rasterise_batch(bgv, c, col, f_) * w)
        grad_fn = jax.grad(loss)

        def run(c0, col, bgv, f_, w):
            def body(c, _):
                return c + 1e-20 * grad_fn(c, col, bgv, f_, w), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    ms = slope_time(step_runner, clip, (colors, bg, faces, weights),
                    "full step", iters=20)
    print(f"full fwd+bwd step (fused prepass): "
          f"{ms if ms is None else round(ms, 2)} ms", flush=True)


if __name__ == "__main__":
    main()
    print("done", flush=True)
