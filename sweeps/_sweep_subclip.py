"""[HISTORICAL -- the SUBCLIP feature was removed after this A/B lost]
Device A/B for per-visit sub-chunk range clipping in the fused-CSR
forward (DIRT_TPU_SUBCLIP) and gradient (DIRT_TPU_GRAD_SUBCLIP).

Round-4 result (TPU v5e, recorded in BASELINE.md): subclip LOSES at every
size on both passes -- fwd 2.6 -> 3.35 ms at 512 faces (BIT-EXACT),
7.2 -> 11.33 at 2048; bwd 1.91 -> 2.52 and 5.68 -> 8.6 (grad relerr vs
xla 2.1e-7/2.8e-7 on device for both variants).  The dynamic fori bounds
and [SUB, PIX]-sliced sweeps cost more than the ~28% lane saving
available (sweeps/_probe_visits.py), so the feature was deleted; this
script no longer runs against HEAD (the monkeypatched constants are
gone) and is kept as measurement provenance.

The fused forward sweeps a whole [CHUNK=64, PIX] plane per (tile, block)
visit; with Morton-sorted blocks most of the 64 face rows cannot reach a
4x128 tile.  The pre-pass now records the live 8-face sub-chunk range per
visit and the kernel sweeps only [lo, hi) with dynamic fori bounds
(sub-chunks on an untiled leading axis).  Output is bit-exact vs the
full-block sweep (partition-independent lexicographic merge) -- this
script verifies that on device and times both variants.

Usage (repo root, TPU env untouched):  python _sweep_subclip.py
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import dispatch, forward_blocks
import bench as B

# Fast stages (~2-3 ms/step) need enough scan iterations that the work
# dominates the ~30-80 ms dispatch+drain constant (profiler-harness traps,
# CLAUDE.md): 6 was the unvalidated session-3 value, 100 puts t_short at
# ~0.3 s.
ITERS = 100
REPEATS = 5


def slope_time(make_runner, seed_arg, scene, tag, iters=None):
    iters = iters or ITERS
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


def probe(segments):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    num_faces = faces.shape[1]
    print(f"=== {num_faces} faces ===", flush=True)
    forward_blocks.FUSED = True
    ref = None

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a):
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    for sub in (False, True):
        forward_blocks.SUBCLIP = sub
        p, a = jax.jit(lambda c: dispatch.forward_batch(
            bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
        cur = (np.asarray(p), np.asarray(a.face_index))
        if ref is None:
            ref, tag = cur, "ref"
        else:
            tag = ("BIT-EXACT" if all(np.array_equal(x, y)
                                      for x, y in zip(ref, cur))
                   else "PARITY-FAIL")
        ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                        f"fwd sub={sub}")
        print(f"fwd blocks-fused subclip={int(sub)}: "
              f"{ms if ms is None else round(ms, 2)} ms ({tag})", flush=True)
    forward_blocks.SUBCLIP = True


def probe_grad(segments):
    """Gradient-side A/B (round 4): DIRT_TPU_GRAD_SUBCLIP is default OFF
    because the [SUB, PIX] sweep is not bitwise vs the slot schedule (see
    grad_blocks.SUBCLIP); this probe provides the on-device parity evidence
    (vs implementation="xla" -- the bench gate only covers the forward) and
    the timing that decides whether the opt-in earns a default flip."""
    from dirt_tpu.ops import backward, grad_blocks
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    num_faces = faces.shape[1]
    print(f"=== grad, {num_faces} faces ===", flush=True)
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
    for sub in (False, True):
        grad_blocks.SUBCLIP = sub
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
                        (gp, clip, faces, px, aux), f"bwd sub={sub}")
        print(f"bwd blocks-fused grad_subclip={int(sub)}: "
              f"{ms if ms is None else round(ms, 2)} ms ({tag})", flush=True)
    grad_blocks.SUBCLIP = False


if __name__ == "__main__":
    probe(64)       # bench config: 512 faces
    probe(256)      # 2048 faces
    probe_grad(64)
    probe_grad(256)
    print("done", flush=True)
