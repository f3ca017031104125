"""Device A/B for DIRT_TPU_SPATIAL_SORT (Morton face re-blocking).

Configs: the bench scene (coherent draw order -- sort should be ~neutral),
and the same scene with a randomly PERMUTED face order at 512/2048/8192
faces (incoherent -- sort should recover most of the coherent-order time).
Forward parity is asserted bitwise vs the unsorted kernel each time.

Usage (repo root, TPU env untouched):  python _sweep_spatial.py
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
from dirt_tpu.ops import backward, dispatch, forward_blocks
import bench as B

ITERS = 6
REPEATS = 5


def slope_time(make_runner, seed, scene, tag):
    short_fn, long_fn = make_runner(ITERS), make_runner(3 * ITERS)
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
            return slope * 1e3 / (2 * ITERS)
        print(f"  [{tag}] implausible slope; retry", flush=True)
    print(f"  [{tag}] TIMING FAILED", flush=True)
    return None


def probe(segments, permute):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    if permute:
        rng = np.random.RandomState(99)
        perm = rng.permutation(faces.shape[1])
        faces = faces[:, perm]
    num_faces = faces.shape[1]
    tag = f"{num_faces}f {'permuted' if permute else 'coherent'}"
    print(f"=== {tag} ===", flush=True)

    # Bitwise forward parity sorted vs unsorted, one image.
    forward_blocks.SPATIAL = False
    p0, a0 = jax.jit(lambda c: dispatch.forward_batch(
        bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
    forward_blocks.SPATIAL = True
    p1, a1 = jax.jit(lambda c: dispatch.forward_batch(
        bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
    ok = ((np.asarray(a0.face_index) == np.asarray(a1.face_index)).all()
          and (np.asarray(p0) == np.asarray(p1)).all())
    print(f"  bitwise parity sorted==unsorted: {ok}", flush=True)

    for spatial in (False, True):
        forward_blocks.SPATIAL = spatial

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
                        f"{tag} spatial={spatial}")
        print(f"  step spatial={int(spatial)}: "
              f"{ms if ms is None else round(ms, 2)} ms", flush=True)
    forward_blocks.SPATIAL = False


if __name__ == "__main__":
    probe(64, permute=False)     # bench config, coherent
    probe(64, permute=True)
    probe(256, permute=True)     # 2048 faces
    probe(1024, permute=True)    # 8192 faces
    print("done", flush=True)
