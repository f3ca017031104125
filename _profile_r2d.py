"""Round-2 TPU profiling, part D: MXU grad VMEM configs + glue breakdown."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu.ops import (backward, forward_dense, forward_pallas, grad_mxu,
                          grad_pallas, dispatch)
import bench as B


def slope_time(name, make_body, carry0, n1=10, n3=110):
    def runner(length):
        return jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (make_body(cc), ()), c, None, length=length)[0])

    def best_of(fn, base):
        times = []
        for k in range(3):
            x = carry0 + base + k * 1e-7
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    try:
        r1, r3 = runner(n1), runner(n3)
        t_c0 = time.perf_counter()
        jax.block_until_ready(r1(carry0))
        jax.block_until_ready(r3(carry0))
        compile_s = time.perf_counter() - t_c0
        t1 = best_of(r1, 1e-6)
        t3 = best_of(r3, 2e-6)
        print(f'{name}: {(t3 - t1) / (n3 - n1) * 1e3:.2f} ms/iter '
              f'(t1={t1*1e3:.0f} t3={t3*1e3:.0f} compile {compile_s:.0f}s)',
              flush=True)
        return (t3 - t1) / (n3 - n1) * 1e3
    except Exception as exc:
        print(name, 'FAILED:', type(exc).__name__, str(exc)[:400], flush=True)
        return None


for segments, tag in ((64, '512f'), (256, '2048f')):
    bg, clip, colors, faces, weights = B.build_scene(16, 256, segments)
    px, aux = jax.jit(lambda cc: dispatch.forward_batch(
        bg, cc, colors, faces, 'pallas'))(clip)
    jax.block_until_ready(px)

    def bwd_mxu(c):
        g = grad_mxu.rasterise_grad_batch(c, faces, px, weights, aux,
                                          interpret=False)
        return c + 1e-30 * g.grad_vertices

    configs = (((8, 128), (16, 64)) if tag == '512f' else ((8, 128),))
    for band, ck in configs:
        grad_mxu.BAND_H, grad_mxu.CHUNK = band, ck
        # correctness first (also fails fast if the compile crashes)
        try:
            g_mxu = jax.jit(lambda cc: grad_mxu.rasterise_grad_batch(
                cc, faces, px, weights, aux, interpret=False))(clip)
            g_sca = jax.jit(lambda cc: grad_pallas.rasterise_grad_batch(
                cc, faces, px, weights, aux, interpret=False))(clip)
            errs = []
            for name in ("grad_vertices", "grad_vertex_colors"):
                a = np.asarray(getattr(g_sca, name))
                b = np.asarray(getattr(g_mxu, name))
                scale = max(np.abs(a).max(), 1.0)
                errs.append(np.abs(a / scale - b / scale).max())
            print(f'mxu band{band} c{ck} {tag}: rel errs {errs}', flush=True)
        except Exception as exc:
            print(f'mxu band{band} c{ck} {tag} FAILED:', str(exc)[:400],
                  flush=True)
            continue
        slope_time(f'bwd mxu band{band} c{ck} {tag}', bwd_mxu, clip)
    grad_mxu.BAND_H, grad_mxu.CHUNK = 8, 128

# --- glue breakdown at the bench scene ---
bg, clip, colors, faces, weights = B.build_scene(16, 256, 64)
px, aux = jax.jit(lambda cc: dispatch.forward_batch(
    bg, cc, colors, faces, 'pallas'))(clip)
jax.block_until_ready(px)

def pack_fwd(c):
    import functools
    fd, counts = jax.vmap(functools.partial(
        forward_pallas._pack_faces, height=256, width=256,
        num_chunks=1, tiles_y=8, tiles_x=2))(c, colors, faces)
    return c + 1e-30 * jnp.sum(fd[..., :1, :1, :1])

def prepass(c):
    pre = backward.grad_prepass(px + 1e-30 * c[:, :1, :1, :1], weights, aux)
    return c + 1e-30 * pre.ax[..., :1, :1, None]

slope_time('glue: fwd pack+bin+sort', pack_fwd, clip)
slope_time('glue: scharr+dilate prepass', prepass, clip)

def step(fwd_backend, grad_backend):
    def body(c):
        def loss(cv):
            return jnp.sum(dirt_tpu.rasterise_batch(
                bg, cv, colors, faces, backend=fwd_backend) * weights)
        import os
        os.environ['DIRT_TPU_GRAD_BACKEND'] = grad_backend
        return c - 1e-30 * jax.grad(loss)(c)
    return body

slope_time('step pallas+scalar (round-1 config)', step('pallas', 'pallas'),
           clip)
slope_time('step dense+mxu', step('dense', 'mxu'), clip)
print('done', flush=True)
