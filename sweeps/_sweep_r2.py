"""Round-2 recorded scaling sweep at production defaults (dense+dense).

Configs: resolution sweep at fixed face count, face-density sweep at fixed
resolution, and a large-mesh config.  Slope-harness timing identical to
bench.py; oracle parity gate on the first image of each config.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

import os as _os
jax.config.update(
    'jax_compilation_cache_dir',
    '/tmp/dirt_tpu_jax_cache_cpu' if _os.environ.get('JAX_PLATFORMS') == 'cpu'
    else '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu.ops import dispatch
from dirt_tpu.utils import oracle
import bench as B


def run(batch, res, segments, iters=20, verify=True):
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    if verify:
        px, aux = jax.jit(lambda cc: dispatch.forward_batch(
            bg[:1], cc, colors[:1], faces[:1]))(clip[:1])
        want_px, want_idx = oracle.rasterise(
            np.asarray(bg[0]), np.asarray(clip[0]), np.asarray(colors[0]),
            np.asarray(faces[0]))
        nbad = int((np.asarray(aux.face_index[0]) != want_idx).sum())
        covered = int((want_idx >= 0).sum())
        dpx = float(np.abs(np.asarray(px[0]) - want_px).max())
        if nbad == 0 and dpx < 1e-4:
            tagv = "parity OK"
        else:
            # Sub-pixel sliver scenes (faces far below one pixel) sit at the
            # f32 edge-function cancellation limit where the winning face at
            # near-tie depths is implementation-sensitive; adjudicate the
            # disagreeing pixels with the double-precision oracle (exact
            # products for f32 inputs -- the true geometry) and report the
            # per-implementation counts instead of a binary verdict.
            idx64 = oracle.visibility_f64(
                np.asarray(clip[0]), np.asarray(faces[0]), res, res)
            kern_vs_64 = int((np.asarray(aux.face_index[0]) != idx64).sum())
            f32_vs_64 = int((want_idx != idx64).sum())
            tagv = (f"idx!={nbad}/{covered} dpx={dpx:.2e} "
                    f"[f64 adjudication: kernel!={kern_vs_64}, "
                    f"f32-oracle!={f32_vs_64}]")
    else:
        tagv = "unverified"

    def loss(cv):
        return jnp.sum(dirt_tpu.rasterise_batch(
            bg, cv, colors, faces) * weights)

    grad_fn = jax.grad(loss)

    def make_runner(length):
        def body(c, _):
            return c + 1e-20 * grad_fn(c), ()
        return jax.jit(
            lambda c: jax.lax.scan(body, c, None, length=length)[0])

    short, long_ = make_runner(iters), make_runner(iters * 3)

    def timed(fn, offs, base):
        B.drain(fn(clip))
        times = []
        for k in offs:
            t0 = time.perf_counter()
            B.drain(fn(clip + base * k))
            times.append(time.perf_counter() - t0)
        import statistics
        return statistics.median(times)

    # Plausibility-gated slope, as in bench.py: a near-zero or negative
    # slope is a relay content-cache lie, not a measurement.
    per_step = None
    for attempt in range(3):
        base = 1e-6 * (10 ** attempt)
        t_s = timed(short, range(1, 4), base)
        t_l = timed(long_, range(4, 7), base)
        slope = t_l - t_s
        if slope > 0 and slope >= 0.3 * t_s:
            per_step = slope / (2 * iters)
            break
        print(f"  implausible slope (t_s={t_s:.4f} t_l={t_l:.4f}); retry",
              flush=True)
    if per_step is None:
        print(f"{res}x{res} b{batch} f{segments * 8}: TIMING FAILED "
              f"({tagv})", flush=True)
        return
    fps = batch / per_step
    print(f"{res}x{res} b{batch} f{segments * 8}: {fps:.1f} f/s/chip "
          f"({per_step * 1e3:.2f} ms/step, {tagv})", flush=True)


if __name__ == "__main__":
    run(16, 128, 64)
    run(16, 256, 64)
    run(4, 512, 64)
    run(16, 256, 256)                 # 2048 faces
    run(16, 256, 1024, iters=5)       # 8192 faces
    run(4, 512, 8192, iters=3)        # 65536 faces, large-mesh config
    print('done', flush=True)
