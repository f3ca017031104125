"""Round-2 TPU profiling, part B: MXU grad kernel + dense forward kernel."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import forward_dense, grad_mxu, dispatch
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


for segments, tag in ((64, '512f'), (256, '2048f')):
    bg, clip, colors, faces, weights = B.build_scene(16, 256, segments)
    px, aux = jax.jit(lambda cc: dispatch.forward_batch(
        bg, cc, colors, faces, 'pallas'))(clip)
    jax.block_until_ready(px)

    def bwd_mxu(c):
        g = grad_mxu.rasterise_grad_batch(c, faces, px, weights, aux,
                                          interpret=False)
        return c + 1e-30 * g.grad_vertices

    def fwd_dense(c):
        p, _ = forward_dense.rasterise_batch(bg, c, colors, faces,
                                             interpret=False)
        return c + 1e-30 * jnp.sum(p)

    # verify dense forward visibility parity on-device once per scene
    try:
        p_d, aux_d = jax.jit(lambda cc: forward_dense.rasterise_batch(
            bg, cc, colors, faces, interpret=False))(clip)
        same = np.asarray(aux_d.face_index[0] == aux.face_index[0])
        print(f'dense visibility parity {tag}:',
              'OK' if same.all() else f'MISMATCH {int((~same).sum())} px',
              flush=True)
    except Exception as exc:
        print(f'dense parity {tag} FAILED:', str(exc)[:300], flush=True)

    bands = (16, 32) if tag == '512f' else (16,)
    for band in bands:
        grad_mxu.BAND_H = band
        slope_time(f'bwd mxu c128 band{band} {tag}', bwd_mxu, clip)
    grad_mxu.BAND_H = 16

    chunks = (32, 64, 128) if tag == '512f' else (64,)
    for ck in chunks:
        forward_dense.CHUNK = ck
        slope_time(f'fwd dense c{ck} {tag}', fwd_dense, clip)
    forward_dense.CHUNK = 64

print('done', flush=True)
