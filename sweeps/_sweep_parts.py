"""Device A/B for the deferred-path `parts` gradient subsets (round 5).

The deferred backward makes TWO gradient-assembly calls and discards half
of each (rasterise_ops._deferred_bwd): vertex grads from the shaded
pixels, attribute/background grads from the G-buffer cotangent.  `parts`
("position" / "color") skips the discarded reductions at the kernel level
(grad_dense.chunk_sums) and shrinks the plane stack
(grad_dense.plane_layout); "color" additionally skips the whole Scharr +
dilation pre-pass.  Computed rows are bitwise-equal to parts="all"
(pinned in tests/test_grad_kernels.py), so this A/B is pure schedule.

Arms (production blocks kernel, bench scene):
  all      -- the pre-round-5 per-call cost
  position -- the deferred shaded-pixels call
  color    -- the deferred G-buffer-cotangent call
The deferred backward cost goes 2 x all -> position + color.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_parts
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


def probe(segments, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== {faces.shape[1]} faces ===", flush=True)

    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces))(clip)
    gp = weights

    # Parity: parts rows bitwise vs all (device check, not just CPU).
    g_all = jax.jit(lambda v: backward.rasterise_grad_batch(
        v, faces, px, gp, aux, implementation="blocks"))(clip)
    g_pos = jax.jit(lambda v: backward.rasterise_grad_batch(
        v, faces, px, gp, aux, implementation="blocks",
        parts="position"))(clip)
    g_col = jax.jit(lambda v: backward.rasterise_grad_batch(
        v, faces, px, gp, aux, implementation="blocks",
        parts="color"))(clip)
    pos_ok = np.array_equal(np.asarray(g_pos.grad_vertices),
                            np.asarray(g_all.grad_vertices))
    col_ok = (np.array_equal(np.asarray(g_col.grad_vertex_colors),
                             np.asarray(g_all.grad_vertex_colors))
              and np.array_equal(np.asarray(g_col.grad_background),
                                 np.asarray(g_all.grad_background)))
    print(f"device parity: position {'BIT-EXACT' if pos_ok else 'FAIL'}, "
          f"color {'BIT-EXACT' if col_ok else 'FAIL'}", flush=True)

    def bwd_runner(parts):
        def make(length):
            def run(c0, gp0, v, f, s=parts):
                del s  # closure tag: distinct jit per parts value
                def body(c, _):
                    g = backward.rasterise_grad_batch(
                        v, f, px, gp0 + 1e-20 * c, aux,
                        implementation="blocks", parts=parts)
                    feedback = (jnp.sum(g.grad_background)
                                + jnp.sum(g.grad_vertices)
                                + jnp.sum(g.grad_vertex_colors))
                    return c + 1e-20 * feedback, ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)
        return make

    results = {}
    for parts in ("all", "position", "color", "all", "position", "color"):
        ms = slope_time(bwd_runner(parts), jnp.float32(0.0),
                        (gp, clip, faces), f"bwd-{parts}", iters)
        print(f"bwd {parts}: {ms if ms is None else round(ms, 2)} ms",
              flush=True)
        if ms is not None:
            results.setdefault(parts, []).append(ms)
    meds = {p: statistics.median(v) for p, v in results.items()}
    for p, m in sorted(meds.items()):
        print(f"  median bwd {p}: {round(m, 2)} ms", flush=True)
    if all(p in meds for p in ("all", "position", "color")):
        old = 2 * meds["all"]
        new = meds["position"] + meds["color"]
        print(f"  deferred backward: 2x all = {round(old, 2)} ms -> "
              f"position + color = {round(new, 2)} ms "
              f"({(old - new) / old:+.1%} saved)", flush=True)


if __name__ == "__main__":
    probe(64, iters=100)
    probe(256, iters=60)
    print("done", flush=True)
