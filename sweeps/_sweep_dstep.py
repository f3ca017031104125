"""End-to-end deferred TRAINING-STEP A/B (round 5): the user-facing cost.

Measures jax.grad of a full rasterise_batch_deferred loss (forward +
shader + deferred backward) under three backward formulations:
  r4    -- two full parts="all" calls (the round-4 formulation)
  parts -- two calls with parts="position"/"color" (round-5 step 1)
  fused -- one sweep with a separate colour cotangent (round-5 step 2,
           DEFERRED_FUSED default)

HARNESS TRAP (cost a wrong conclusion before being caught): the scan
feedback must consume EVERY gradient output.  Consuming only the vertex
gradient lets XLA dead-code-eliminate the colour half of the TWO-CALL
arms -- which a fused kernel cannot split -- making "fused" measure
SLOWER than an arm that silently computed half the gradients.  With all
three gradients consumed the ranking inverts to the expected one.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_dstep
"""
import statistics
import time

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu import rasterise_ops
from dirt_tpu.ops import backward
import bench as B

REPEATS = 5


def slope_time(make_runner, seed, scene, tag, iters):
    short_fn, long_fn = make_runner(iters), make_runner(3 * iters)
    B.drain(short_fn(seed, *scene))
    B.drain(long_fn(seed, *scene))
    for attempt in range(3):
        base = 1e-6 * (10 ** attempt)

        def timed(fn, offs):
            ts = []
            for k in offs:
                t0 = time.perf_counter()
                B.drain(fn(seed + base * k, *scene))
                ts.append(time.perf_counter() - t0)
            return statistics.median(ts)

        t_s = timed(short_fn, range(1, REPEATS + 1))
        t_l = timed(long_fn, range(REPEATS + 1, 2 * REPEATS + 1))
        slope = t_l - t_s
        if slope > 0 and slope >= 0.3 * t_s:
            return slope * 1e3 / (2 * iters)
        print(f"  [{tag}] implausible; retry", flush=True)
    print(f"  [{tag}] TIMING FAILED", flush=True)
    return None


def main():
    batch, res, segments = 16, 256, 64
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    light = jnp.asarray([0.9, 0.7, 0.5])
    shader = lambda gb: jnp.tanh(gb * light)

    def loss(c, col, bgv, f, w):
        return jnp.sum(dirt_tpu.rasterise_batch_deferred(
            bgv, c, col, f, shader_fn=shader) * w)

    def step_runner(mode):
        def make(length):
            rasterise_ops.DEFERRED_FUSED = mode == "fused"
            grad_fn = jax.grad(loss, argnums=(0, 1, 2))
            orig = backward.rasterise_grad_grouped
            if mode == "r4":
                def grouped_all(v, f_, p, gp, aux, parts="all"):
                    return orig(v, f_, p, gp, aux, parts="all")
                backward.rasterise_grad_grouped = grouped_all

            def run(c0, col, bgv, f, w, tag=mode):
                del tag
                def body(c, _):
                    gc, ga, gb_ = grad_fn(c, col, bgv, f, w)
                    fb = gc + 1e-20 * (jnp.sum(ga) + jnp.sum(gb_))
                    return c + 1e-20 * fb, ()
                return jax.lax.scan(body, c0, None, length=length)[0]

            out = jax.jit(run)
            if mode == "r4":
                out(jnp.zeros_like(clip), colors, bg, faces,
                    weights).block_until_ready()
                backward.rasterise_grad_grouped = orig
            return out
        return make

    res_d = {}
    scene = (colors, bg, faces, weights)
    for rep in range(2):
        for mode in ("r4", "parts", "fused"):
            ms = slope_time(step_runner(mode), clip, scene,
                            f"dstep-{mode}", 30)
            print(f"deferred train step [{mode}]: "
                  f"{ms if ms is None else round(ms, 3)} ms", flush=True)
            if ms is not None:
                res_d.setdefault(mode, []).append(ms)
    meds = {k: statistics.median(v) for k, v in res_d.items()}
    for k, m in sorted(meds.items()):
        print(f"median {k}: {round(m, 3)} ms", flush=True)


if __name__ == "__main__":
    main()
    print("done", flush=True)
