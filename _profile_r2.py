"""Round-2 TPU profiling: scalar vs MXU gradient kernels, fwd sanity.

Run on the real TPU (env untouched):  python _profile_r2.py
Writes progress lines as measurements land; uses the slope harness with
fresh inputs (see bench.py timed() rationale).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu.ops import forward_pallas, grad_pallas, grad_mxu, dispatch
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
              f'(compile+warm {compile_s:.0f}s)', flush=True)
    except Exception as exc:
        print(name, 'FAILED:', type(exc).__name__, str(exc)[:300], flush=True)


def scene(segments):
    return B.build_scene(16, 256, segments)


for segments, tag in ((64, '512f'), (256, '2048f')):
    bg, clip, colors, faces, weights = scene(segments)
    px, aux = jax.jit(lambda cc: dispatch.forward_batch(
        bg, cc, colors, faces, 'pallas'))(clip)
    jax.block_until_ready(px)

    def fwd_body(c):
        p, _ = forward_pallas.rasterise_batch(bg, c, colors, faces,
                                              interpret=False)
        return c + 1e-30 * jnp.sum(p)

    def bwd_scalar(c):
        g = grad_pallas.rasterise_grad_batch(c, faces, px, weights, aux,
                                             interpret=False)
        return c + 1e-30 * g.grad_vertices

    def bwd_mxu(c):
        g = grad_mxu.rasterise_grad_batch(c, faces, px, weights, aux,
                                          interpret=False)
        return c + 1e-30 * g.grad_vertices

    if tag == '512f':
        slope_time(f'fwd pallas c512 {tag}', fwd_body, clip)
    slope_time(f'bwd scalar c128 {tag}', bwd_scalar, clip)
    for band in (16, 32):
        grad_mxu.BAND_H = band
        slope_time(f'bwd mxu c128 band{band} {tag}', bwd_mxu, clip)
    grad_mxu.BAND_H = 16

print('done', flush=True)
