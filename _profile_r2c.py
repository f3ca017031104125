"""Round-2 TPU profiling, part C: NN-layout MXU grad + 2-D dense forward."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import forward_dense, grad_mxu, grad_pallas, dispatch
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
        return times

    try:
        r1, r3 = runner(n1), runner(n3)
        t_c0 = time.perf_counter()
        jax.block_until_ready(r1(carry0))
        jax.block_until_ready(r3(carry0))
        compile_s = time.perf_counter() - t_c0
        t1s = best_of(r1, 1e-6)
        t3s = best_of(r3, 2e-6)
        t1, t3 = min(t1s), min(t3s)
        print(f'{name}: {(t3 - t1) / (n3 - n1) * 1e3:.2f} ms/iter '
              f'(t1={t1*1e3:.0f}ms t3={t3*1e3:.0f}ms raw1={t1s} raw3={t3s} '
              f'compile {compile_s:.0f}s)', flush=True)
    except Exception as exc:
        print(name, 'FAILED:', type(exc).__name__, str(exc)[:2000], flush=True)


for segments, tag in ((64, '512f'), (256, '2048f')):
    bg, clip, colors, faces, weights = B.build_scene(16, 256, segments)
    px, aux = jax.jit(lambda cc: dispatch.forward_batch(
        bg, cc, colors, faces, 'pallas'))(clip)
    jax.block_until_ready(px)

    # --- on-TPU correctness: mxu grad vs scalar grad ---
    try:
        g_mxu = jax.jit(lambda cc: grad_mxu.rasterise_grad_batch(
            cc, faces, px, weights, aux, interpret=False))(clip)
        g_sca = jax.jit(lambda cc: grad_pallas.rasterise_grad_batch(
            cc, faces, px, weights, aux, interpret=False))(clip)
        for name in ("grad_vertices", "grad_vertex_colors",
                     "grad_background"):
            a = np.asarray(getattr(g_sca, name))
            b = np.asarray(getattr(g_mxu, name))
            scale = max(np.abs(a).max(), 1.0)
            err = np.abs(a / scale - b / scale).max()
            print(f'mxu-vs-scalar {name} {tag}: max rel err {err:.2e}',
                  flush=True)
    except Exception as exc:
        print(f'mxu correctness {tag} FAILED:', str(exc)[:2000], flush=True)

    # --- dense forward parity on device ---
    try:
        p_d, aux_d = jax.jit(lambda cc: forward_dense.rasterise_batch(
            bg, cc, colors, faces, interpret=False))(clip)
        same = np.asarray(aux_d.face_index == aux.face_index)
        pix_err = np.abs(np.asarray(p_d) - np.asarray(px)).max()
        print(f'dense parity {tag}:',
              'visibility OK' if same.all()
              else f'MISMATCH {int((~same).sum())} px',
              f'pix err {pix_err:.2e}', flush=True)
    except Exception as exc:
        print(f'dense parity {tag} FAILED:', str(exc)[:2000], flush=True)

    def bwd_mxu(c):
        g = grad_mxu.rasterise_grad_batch(c, faces, px, weights, aux,
                                          interpret=False)
        return c + 1e-30 * g.grad_vertices

    def fwd_dense(c):
        p, _ = forward_dense.rasterise_batch(bg, c, colors, faces,
                                             interpret=False)
        return c + 1e-30 * jnp.sum(p)

    slope_time(f'bwd mxu c128 band16 {tag}', bwd_mxu, clip)
    chunks = (32, 64, 128) if tag == '512f' else (64,)
    for ck in chunks:
        forward_dense.CHUNK = ck
        slope_time(f'fwd dense c{ck} {tag}', fwd_dense, clip)
    forward_dense.CHUNK = 64

print('done', flush=True)
