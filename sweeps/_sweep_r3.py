"""Round-3 kernel-tuning sweep: per-pass timings of gradient/forward
variants at the bench config, on real TPU.

Variants are selected by monkeypatching module constants (TILE/CHUNK/BAND)
before tracing -- the constants are read at trace time, so one process
sweeps every variant while keeping the single relay session and its compile
cache.  Timing follows bench.py's hardened slope harness (median-of-odd
repeats, fresh perturbed inputs, slope plausibility check); each gradient
variant is parity-checked against the on-device XLA path first (the
native-oracle gate only covers the forward).

Usage (repo root, TPU env untouched):  python _sweep_r3.py [quick]
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

from dirt_tpu.ops import backward, dispatch, forward_dense, grad_dense, grad_mxu
import bench as B

ITERS = 10
REPEATS = 5


def slope_time(short_fn, long_fn, seed_arg, scene, tag):
    """Median-of-REPEATS slope timing; returns ms per step or None."""
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
    print(f"  [{tag}] TIMING FAILED after 3 attempts", flush=True)
    return None


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    batch, res, segments = 16, 256, 64
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)

    # Forward output + aux once (production dense defaults) for bwd-only runs.
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces, "dense"))(clip)
    gp = weights   # cotangent of sum(px * weights)
    g_ref = None

    def bwd_runner(impl, length):
        def run(gp0, v_a, f_a, px_a, aux_a):
            def body(gp_c, _):
                g = backward.rasterise_grad_batch(
                    v_a, f_a, px_a, gp_c, aux_a, implementation=impl)
                return gp_c + 1e-20 * jnp.sum(g.grad_vertices), ()
            return jax.lax.scan(body, gp0, None, length=length)[0]
        return jax.jit(run)

    def check_bwd(impl):
        nonlocal g_ref
        if g_ref is None:
            g_ref = jax.jit(lambda v_a, f_a, p_a, g_a: backward.rasterise_grad_batch(
                v_a, f_a, p_a, g_a, aux, implementation="xla"))(
                clip, faces, px, gp)
        g = jax.jit(lambda v_a, f_a, p_a, g_a: backward.rasterise_grad_batch(
            v_a, f_a, p_a, g_a, aux, implementation=impl))(
            clip, faces, px, gp)
        worst = 0.
        for name in ("grad_vertices", "grad_vertex_colors", "grad_background"):
            a = np.asarray(getattr(g_ref, name))
            b = np.asarray(getattr(g, name))
            scale = max(np.abs(a).max(), 1.0)
            worst = max(worst, float(np.abs(a / scale - b / scale).max()))
        return worst

    def bwd_variant(tag, impl, mod=None, **attrs):
        saved = {k: getattr(mod, k) for k in attrs} if mod else {}
        if mod:
            for k, v in attrs.items():
                setattr(mod, k, v)
        try:
            err = check_bwd(impl)
            parity = f"relerr {err:.1e}" + (" PARITY-FAIL" if err > 1e-5 else "")
            ms = slope_time(bwd_runner(impl, ITERS), bwd_runner(impl, 3 * ITERS),
                            gp, (clip, faces, px, aux), tag)
            print(f"bwd {tag}: {ms if ms is None else round(ms, 2)} ms "
                  f"({parity})", flush=True)
        finally:
            if mod:
                for k, v in saved.items():
                    setattr(mod, k, v)

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a):
            def body(c, _):
                p, _aux = dispatch.forward_batch(bg_a, c, col_a, f_a, "dense")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    def fwd_variant(tag, **attrs):
        saved = {k: getattr(forward_dense, k) for k in attrs}
        for k, v in attrs.items():
            setattr(forward_dense, k, v)
        try:
            p, a = jax.jit(lambda c: dispatch.forward_batch(
                bg[:1], c, colors[:1], faces[:1], "dense"))(clip[:1])
            same = (np.asarray(a.face_index) == np.asarray(aux.face_index[:1])).all()
            dpx = float(np.abs(np.asarray(p) - np.asarray(px[:1])).max())
            parity = f"idx {'OK' if same else 'MISMATCH'} dpx {dpx:.1e}"
            ms = slope_time(fwd_runner(ITERS), fwd_runner(3 * ITERS),
                            clip, (bg, colors, faces, weights), tag)
            print(f"fwd {tag}: {ms if ms is None else round(ms, 2)} ms "
                  f"({parity})", flush=True)
        finally:
            for k, v in saved.items():
                setattr(forward_dense, k, v)

    # --- gradient backends ---
    # The round-3 device sweep measured ~2 us fixed cost per grid step
    # (shrinking tiles made everything slower), motivating the FUSED
    # schedules (in-kernel chunk loop, grid (batch, tiles)).
    bwd_variant("dense fused t32x128 c64", "dense")
    bwd_variant("dense chunk-grid t32x128 c64", "dense", grad_dense,
                FUSED=False)
    if not quick:
        bwd_variant("dense fused t16x128 c64", "dense", grad_dense,
                    TILE_H=16)
        bwd_variant("dense fused t16x128 c32", "dense", grad_dense,
                    TILE_H=16, CHUNK=32)
        bwd_variant("dense fused t8x128 c32", "dense", grad_dense,
                    TILE_H=8, CHUNK=32)
        bwd_variant("dense fused t32x128 c32", "dense", grad_dense,
                    CHUNK=32)

    # --- forward variants ---
    fwd_variant("dense fused t32x128 c64")
    fwd_variant("dense chunk-grid t32x128 c64", FUSED=False)
    if not quick:
        fwd_variant("dense fused t16x128 c64", TILE_H=16)
        fwd_variant("dense fused t16x128 c32", TILE_H=16, CHUNK=32)
        fwd_variant("dense fused t8x128 c32", TILE_H=8, CHUNK=32)
        fwd_variant("dense fused t32x128 c32", CHUNK=32)
    print("done", flush=True)


if __name__ == "__main__":
    main()
