"""Device A/B for the fused deferred backward (round 5).

The deferred backward needs vertex grads from the shaded pixels and
attribute/background grads from the G-buffer cotangent.  Round 5 first
cut each of the two calls down to the rows it consumes (`parts`,
sweeps/_sweep_parts.py: 2x all -> position + color).  This sweep measures
the NEXT step: one parts="all"-shaped sweep whose colour reductions read
a separate cotangent (backward.rasterise_grad_deferred /
`color_cotangent`), so both halves share the face-table pack, the kernel
launch, the per-visit face-id reads and one output scatter.

Arms (production blocks kernel, bench scene, Phong-like 3-channel
G-buffer so one group pair fuses; plus a 7-channel G-buffer arm for the
grouped regime):
  twocall -- position sweep + color sweep (the round-5 parts default)
  fused   -- rasterise_grad_deferred (one sweep per paired group)
Parity: fused outputs BITWISE-equal to twocall on device.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_dbwd
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import backward, dispatch
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


def probe(segments, attrs, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    rng = np.random.RandomState(7)
    if attrs == 3:
        attr_vals, abg = colors, bg
    else:
        attr_vals = jnp.asarray(rng.uniform(
            size=(batch, colors.shape[1], attrs)).astype(np.float32))
        abg = jnp.asarray(rng.uniform(
            size=(batch, res, res, attrs)).astype(np.float32))
    print(f"=== {faces.shape[1]} faces, {attrs}-channel G-buffer ===",
          flush=True)

    gbuffer, aux = jax.jit(lambda c: dispatch.forward_batch(
        abg, c, attr_vals, faces))(clip)
    light = jnp.asarray(rng.uniform(0.2, 1.0, size=attrs), jnp.float32)
    shader = lambda gb: jnp.tanh(gb * light)[..., :3]
    pixels, shader_vjp = jax.vjp(shader, gbuffer)
    gp = jnp.asarray(rng.randn(
        *np.asarray(pixels).shape).astype(np.float32))
    (ggb,) = shader_vjp(gp)

    # --- device bitwise parity: fused vs two-call ---
    def two_call(v):
        _, gv, _ = backward.rasterise_grad_grouped(
            v, faces, pixels, gp, aux, parts="position")
        gb_, _, ga = backward.rasterise_grad_grouped(
            v, faces, gbuffer, ggb, aux, parts="color")
        return gb_, gv, ga

    def fused(v):
        return backward.rasterise_grad_deferred(
            v, faces, pixels, gp, gbuffer, ggb, aux)

    ref = jax.jit(two_call)(clip)
    got = jax.jit(fused)(clip)
    names = ("background", "vertices", "attributes")
    ok = all(np.array_equal(np.asarray(r), np.asarray(g))
             for r, g in zip(ref, got))
    print("device parity: " + ("BIT-EXACT" if ok else "FAIL " + str([
        (n, float(np.abs(np.asarray(r) - np.asarray(g)).max()))
        for n, r, g in zip(names, ref, got)])), flush=True)

    def runner(form):
        fn = two_call if form == "twocall" else fused

        def make(length):
            def run(c0, gp0, v, s=form):
                del gp0, s  # closure tag: distinct jit per arm
                def body(c, _):
                    out = fn(v + 1e-20 * c)
                    feedback = sum(jnp.sum(o) for o in out)
                    return c + 1e-20 * feedback, ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)
        return make

    results = {}
    for form in ("twocall", "fused", "twocall", "fused"):
        ms = slope_time(runner(form), jnp.float32(0.0), (gp, clip),
                        f"dbwd-{form}", iters)
        print(f"deferred bwd {form}: "
              f"{ms if ms is None else round(ms, 2)} ms", flush=True)
        if ms is not None:
            results.setdefault(form, []).append(ms)
    meds = {k: statistics.median(v) for k, v in results.items()}
    if len(meds) == 2:
        old, new = meds["twocall"], meds["fused"]
        print(f"  median: twocall {round(old, 2)} -> fused "
              f"{round(new, 2)} ms ({(old - new) / old:+.1%} saved)",
              flush=True)


if __name__ == "__main__":
    probe(64, 3, iters=60)
    probe(256, 3, iters=40)
    probe(64, 7, iters=40)
    print("done", flush=True)
