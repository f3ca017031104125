"""Per-stage breakdown probe for the mid/large-mesh configs (on real TPU).

Times, with the hardened slope harness, at 2048 and 8192 faces (256^2,
batch 16): the forward pass (production auto backend), the gradient pass
(production blocks), and the XLA pack / CSR table build in isolation --
to locate where the >=2048-face rows' time actually goes before
optimising anything.

Usage (repo root, TPU env untouched):  python _probe_large.py [segments...]
"""
import functools
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import backward, dispatch, forward_blocks, forward_dense, \
    forward_pallas
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
    backend = dispatch.default_backend(num_faces)
    print(f"=== {num_faces} faces (backend {backend}) ===", flush=True)

    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces, backend))(clip)
    gp = weights

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a):
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, backend)
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    def bwd_runner(length):
        def run(gp0, v_a, f_a, px_a, aux_a):
            def body(gp_c, _):
                g = backward.rasterise_grad_batch(
                    v_a, f_a, px_a, gp_c, aux_a, implementation="blocks")
                return gp_c + 1e-20 * jnp.sum(g.grad_vertices), ()
            return jax.lax.scan(body, gp0, None, length=length)[0]
        return jax.jit(run)

    ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights), "fwd")
    print(f"fwd full ({backend}): {ms and round(ms, 2)} ms", flush=True)
    ms = slope_time(bwd_runner, gp, (clip, faces, px, aux), "bwd")
    print(f"bwd full (blocks): {ms and round(ms, 2)} ms", flush=True)

    if backend == "blocks":
        for th in (16, 8):
            saved = forward_blocks.TILE_H
            forward_blocks.TILE_H = th
            try:
                p, a = jax.jit(lambda c: dispatch.forward_batch(
                    bg[:1], c, colors[:1], faces[:1], backend))(clip[:1])
                same = (np.asarray(a.face_index)
                        == np.asarray(aux.face_index[:1])).all()
                ms = slope_time(fwd_runner, clip,
                                (bg, colors, faces, weights), f"fwd t{th}")
                print(f"fwd blocks t{th}x128: {ms and round(ms, 2)} ms "
                      f"(idx {'OK' if same else 'MISMATCH'})", flush=True)
            finally:
                forward_blocks.TILE_H = saved

    # --- pack / table-build stages in isolation ---
    if backend == "dense":
        th, tw = forward_dense.tile_shape(res, res)
        tiles_y, tiles_x = -(-res // th), -(-res // tw)
        num_chunks = max(1, -(-forward_pallas.tile_face_cap(num_faces)
                              // forward_dense.CHUNK))
        pack = functools.partial(
            forward_pallas._pack_faces, height=res, width=res,
            num_chunks=num_chunks, tiles_y=tiles_y, tiles_x=tiles_x,
            chunk=forward_dense.CHUNK, tile_h=th, tile_w=tw)

        def pack_runner(length):
            def run(c0, col_a, f_a):
                def body(c, _):
                    fd, counts, dropped = jax.vmap(pack)(c, col_a, f_a)
                    return c + 1e-20 * (jnp.sum(fd[..., 0, 0])
                                        + jnp.sum(counts.astype(jnp.float32))), ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)

        ms = slope_time(pack_runner, clip, (colors, faces), "pack")
        print(f"pack (dense per-tile argsort): {ms and round(ms, 2)} ms",
              flush=True)
    else:
        CH = forward_blocks.CHUNK
        num_blocks = -(-num_faces // CH)
        tiles_y = -(-res // forward_blocks.TILE_H)
        tiles_x = -(-res // forward_blocks.TILE_W)
        num_slots = forward_blocks.slots_per_image(
            tiles_y * tiles_x, num_blocks)
        print(f"  csr: {num_blocks} blocks, {tiles_y * tiles_x} tiles, "
              f"{num_slots} static slots/image", flush=True)

        def pack_one(v, c, f):
            face_data = forward_pallas._face_table(
                v, c, f, res, res, num_blocks * CH - num_faces)
            hit = forward_blocks.hit_matrix(
                face_data, (20, 21, 22, 23), num_blocks, CH,
                tiles_y, tiles_x, forward_blocks.TILE_H,
                forward_blocks.TILE_W)
            return forward_blocks.build_slots(hit, num_slots)

        def tables_runner(length):
            def run(c0, col_a, f_a):
                def body(c, _):
                    st, sb, sd, dr = jax.vmap(pack_one)(c, col_a, f_a)
                    acc = 1e-20 * jnp.sum((st + sb + sd + dr[:, None])
                                          .astype(jnp.float32))
                    return c + acc, ()
                return jax.lax.scan(body, c0, None, length=length)[0]
            return jax.jit(run)

        ms = slope_time(tables_runner, clip, (colors, faces), "tables")
        print(f"CSR tables+slots: {ms and round(ms, 2)} ms", flush=True)

        # Actual hit statistics (how many of the static slots are live).
        st, sb, sd, dr = jax.vmap(pack_one)(clip, colors, faces)
        active = np.asarray(jnp.sum(sb >= 0, axis=1))
        print(f"  live slots/image: min {active.min()} max {active.max()} "
              f"mean {active.mean():.0f} of {num_slots}; dropped "
              f"{np.asarray(dr).max()}", flush=True)


if __name__ == "__main__":
    segs = [int(s) for s in sys.argv[1:]] or [256, 1024]
    for s in segs:
        probe(s)
    print("done", flush=True)
