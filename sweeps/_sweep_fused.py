"""Device A/B of the fused-CSR schedules vs the slot schedules, with
parity checks, at the bench config and the large-mesh configs.

Variants are selected by monkeypatching FUSED before tracing.  Timing
follows bench.py's hardened slope harness; every fused variant is
parity-checked against its slot twin on device first (bitwise for the
forward winner map, elementwise for gradients).

Usage (repo root, TPU env untouched):  python _sweep_fused.py [segments...]
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
    print(f"=== {num_faces} faces ===", flush=True)

    # Forward A/B (blocks backend regardless of the auto threshold).
    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a):
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    fwd_out = {}
    for fused in (False, True):
        forward_blocks.FUSED = fused
        tag = "fused" if fused else "slot"
        p, a = jax.jit(lambda c: dispatch.forward_batch(
            bg, c, colors, faces, "blocks"))(clip)
        fwd_out[fused] = (np.asarray(p), np.asarray(a.face_index))
        ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                        f"fwd {tag}")
        print(f"fwd blocks {tag}: {ms if ms is None else round(ms, 2)} ms",
              flush=True)
    idx_ok = (fwd_out[True][1] == fwd_out[False][1]).all()
    px_ok = (fwd_out[True][0] == fwd_out[False][0]).all()
    print(f"fwd parity fused==slot: idx {'OK' if idx_ok else 'MISMATCH'} "
          f"px {'OK' if px_ok else 'MISMATCH'}", flush=True)

    # Gradient A/B (aux from the production forward).
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces, dispatch.default_backend(num_faces)))(clip)
    gp = weights

    def bwd_runner(length):
        def run(gp0, v_a, f_a, px_a, aux_a):
            def body(gp_c, _):
                g = backward.rasterise_grad_batch(
                    v_a, f_a, px_a, gp_c, aux_a, implementation="blocks")
                return gp_c + 1e-20 * jnp.sum(g.grad_vertices), ()
            return jax.lax.scan(body, gp0, None, length=length)[0]
        return jax.jit(run)

    bwd_out = {}
    for fused in (False, True):
        grad_blocks.FUSED = fused
        tag = "fused" if fused else "slot"
        g = jax.jit(lambda v_a, f_a, p_a, g_a: backward.rasterise_grad_batch(
            v_a, f_a, p_a, g_a, aux, implementation="blocks"))(
            clip, faces, px, gp)
        bwd_out[fused] = {n: np.asarray(getattr(g, n)) for n in
                          ("grad_vertices", "grad_vertex_colors")}
        ms = slope_time(bwd_runner, gp, (clip, faces, px, aux), f"bwd {tag}")
        print(f"bwd blocks {tag}: {ms if ms is None else round(ms, 2)} ms",
              flush=True)
    worst = 0.
    for n, a in bwd_out[False].items():
        b = bwd_out[True][n]
        scale = max(np.abs(a).max(), 1.0)
        worst = max(worst, float(np.abs(a / scale - b / scale).max()))
    print(f"bwd parity fused vs slot: relerr {worst:.1e}"
          f"{' PARITY-FAIL' if worst > 1e-5 else ''}", flush=True)


if __name__ == "__main__":
    segs = [int(s) for s in sys.argv[1:]] or [64, 256, 1024]
    for s in segs:
        probe(s)
    print("done", flush=True)
