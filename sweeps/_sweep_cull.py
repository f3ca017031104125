"""Device A/B for the half-plane tile cull (forward_blocks._edge_keep).

Bitwise forward parity on/off, then forward / backward / full-step slope
times with the cull on and off, plus the per-image visit counts it saves,
at the bench config and the 2048-face config.

Usage (repo root, TPU env untouched):  python _sweep_cull.py
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
from dirt_tpu.ops import backward, dispatch, forward_blocks, forward_pallas
import bench as B

REPEATS = 5


def slope_time(make_runner, seed, scene, tag, iters):
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


def visits(clip, colors, faces, height, width):
    tile_h, tile_w = forward_blocks.tile_h_for(), forward_blocks.TILE_W
    chunk = forward_blocks.chunk_for()
    nf = faces.shape[1]
    nb = -(-nf // chunk)
    ty, tx = -(-height // tile_h), -(-width // tile_w)

    def count_one(v, c, f):
        fd = forward_pallas._face_table(v, c, f, height, width,
                                        nb * chunk - nf)
        if forward_blocks.SPATIAL:
            order = forward_blocks.spatial_order(
                fd, (20, 21, 22, 23), tile_h, tile_w)
            fd = jnp.take(fd, order, axis=0)
        hit = forward_blocks.hit_matrix(
            fd, (20, 21, 22, 23), nb, chunk, ty, tx, tile_h, tile_w,
            edge_cols=0 if forward_blocks.EDGE_CULL else None,
            height=height, width=width)
        return jnp.sum(hit)

    return int(np.asarray(jax.jit(
        lambda c: jax.vmap(count_one)(c, colors, faces))(clip)).sum())


def probe(segments):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== {faces.shape[1]} faces ===", flush=True)

    forward_blocks.EDGE_CULL = False
    p0, a0 = jax.jit(lambda c: dispatch.forward_batch(
        bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
    n_off = visits(clip, colors, faces, res, res)
    forward_blocks.EDGE_CULL = True
    p1, a1 = jax.jit(lambda c: dispatch.forward_batch(
        bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
    n_on = visits(clip, colors, faces, res, res)
    ok = ((np.asarray(a0.face_index) == np.asarray(a1.face_index)).all()
          and (np.asarray(p0) == np.asarray(p1)).all())
    print(f"  bitwise parity on==off: {ok}; forward visits "
          f"{n_off} -> {n_on} ({100 * (1 - n_on / n_off):.0f}% cut)",
          flush=True)

    def step_runner(length):
        def loss(c, col, bgv, f_, w):
            return jnp.sum(dirt_tpu.rasterise_batch(bgv, c, col, f_) * w)
        grad_fn = jax.grad(loss)

        def run(c0, col, bgv, f_, w):
            def body(c, _):
                return c + 1e-20 * grad_fn(c, col, bgv, f_, w), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    def fwd_runner(length):
        def run(c0, col, bgv, f_, w):
            def body(c, _):
                p, _ = dispatch.forward_batch(bgv, c, col, f_)
                return c + 1e-20 * jnp.sum(p * w), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    scene = (colors, bg, faces, weights)
    for cull in (False, True):
        forward_blocks.EDGE_CULL = cull
        ms_f = slope_time(fwd_runner, clip, scene, f"fwd cull={int(cull)}",
                          iters=40)
        ms_s = slope_time(step_runner, clip, scene, f"step cull={int(cull)}",
                          iters=20)
        print(f"  cull={int(cull)}: fwd "
              f"{ms_f if ms_f is None else round(ms_f, 2)} ms, step "
              f"{ms_s if ms_s is None else round(ms_s, 2)} ms", flush=True)
    forward_blocks.EDGE_CULL = True


if __name__ == "__main__":
    probe(64)
    probe(256)
    print("done", flush=True)
