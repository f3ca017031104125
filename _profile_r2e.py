"""Round-2 TPU profiling, part E: dense gradient kernel vs scalar; steps."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu.ops import dispatch, grad_dense, grad_pallas
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
        ms = (t3 - t1) / (n3 - n1) * 1e3
        print(f'{name}: {ms:.2f} ms/iter '
              f'(t1={t1*1e3:.0f} t3={t3*1e3:.0f} compile {compile_s:.0f}s)',
              flush=True)
        return ms
    except Exception as exc:
        print(name, 'FAILED:', type(exc).__name__, str(exc)[:400], flush=True)
        return None


for segments, tag in ((64, '512f'), (256, '2048f')):
    bg, clip, colors, faces, weights = B.build_scene(16, 256, segments)
    px, aux = jax.jit(lambda cc: dispatch.forward_batch(
        bg, cc, colors, faces, 'pallas'))(clip)
    jax.block_until_ready(px)

    # correctness on-device first
    try:
        g_den = jax.jit(lambda cc: grad_dense.rasterise_grad_batch(
            cc, faces, px, weights, aux, interpret=False))(clip)
        g_sca = jax.jit(lambda cc: grad_pallas.rasterise_grad_batch(
            cc, faces, px, weights, aux, interpret=False))(clip)
        errs = []
        for name in ("grad_vertices", "grad_vertex_colors"):
            a = np.asarray(getattr(g_sca, name))
            b = np.asarray(getattr(g_den, name))
            scale = max(np.abs(a).max(), 1.0)
            errs.append(float(np.abs(a / scale - b / scale).max()))
        print(f'dense grad {tag}: rel errs {errs}', flush=True)
    except Exception as exc:
        print(f'dense grad {tag} FAILED:', str(exc)[:500], flush=True)
        continue

    def bwd_dense(c):
        g = grad_dense.rasterise_grad_batch(c, faces, px, weights, aux,
                                            interpret=False)
        return c + 1e-30 * g.grad_vertices

    def bwd_scalar(c):
        g = grad_pallas.rasterise_grad_batch(c, faces, px, weights, aux,
                                             interpret=False)
        return c + 1e-30 * g.grad_vertices

    slope_time(f'bwd dense c{grad_dense.CHUNK} {tag}', bwd_dense, clip)
    if tag == '512f':
        slope_time(f'bwd scalar {tag}', bwd_scalar, clip)
        for ck in (32, 128):
            grad_dense.CHUNK = ck
            slope_time(f'bwd dense c{ck} {tag}', bwd_dense, clip)
        grad_dense.CHUNK = 64


def step(fwd_backend, grad_backend, scene):
    bg, clip, colors, faces, weights = scene

    def body(c):
        def loss(cv):
            return jnp.sum(dirt_tpu.rasterise_batch(
                bg, cv, colors, faces, backend=fwd_backend) * weights)
        import os
        os.environ['DIRT_TPU_GRAD_BACKEND'] = grad_backend
        return c - 1e-30 * jax.grad(loss)(c)
    return body, clip


for segments, tag in ((64, '512f'), (256, '2048f')):
    scene = B.build_scene(16, 256, segments)
    for fb, gb in (('dense', 'dense'), ('pallas', 'dense'),
                   ('dense', 'pallas')):
        body, clip = step(fb, gb, scene)
        slope_time(f'step {fb}+{gb} {tag}', body, clip)
print('done', flush=True)
