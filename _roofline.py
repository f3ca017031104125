"""Measure empirical machine peaks on the attached TPU for BASELINE.md.

Three microbenchmarks, each timed with the same lax.scan slope harness as
bench.py (fresh inputs per timed call; min of 3):
  * VPU f32: chained elementwise FMAs on a large array.
  * MXU: large f32 matmul (default precision).
  * HBM: big-array copy (read + write).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)


def slope_time(name, make_body, carry0, n1=5, n3=55):
    def runner(length):
        return jax.jit(lambda c: jax.lax.scan(
            lambda cc, _: (make_body(cc), ()), c, None, length=length)[0])
    r1, r3 = runner(n1), runner(n3)
    jax.block_until_ready(r1(carry0))
    jax.block_until_ready(r3(carry0))

    def best_of(fn, base):
        times = []
        for k in range(3):
            x = carry0 + base + k * 1e-7
            t0 = time.perf_counter()
            jax.block_until_ready(fn(x))
            times.append(time.perf_counter() - t0)
        return min(times)

    t1 = best_of(r1, 1e-6)
    t3 = best_of(r3, 2e-6)
    s = (t3 - t1) / (n3 - n1)
    print(f'{name}: {s * 1e3:.3f} ms/iter', flush=True)
    return s


N = 32 * 1024 * 1024   # 128 MB of f32
x0 = jnp.ones((N,), jnp.float32) * 0.5

K = 64
def vpu_body(c):
    y = c
    for _ in range(K):
        y = y * 1.000000119 + 1e-9      # one FMA per element per round
    return y

s = slope_time('vpu fma chain', vpu_body, x0)
print(f'VPU f32: {2 * K * N / s / 1e12:.2f} Tflop/s', flush=True)


def hbm_body(c):
    return c + 1.0                       # read N*4 + write N*4 bytes

s = slope_time('hbm stream add', hbm_body, x0)
print(f'HBM stream: {8 * N / s / 1e9:.1f} GB/s', flush=True)

M = 4096
a0 = jnp.ones((M, M), jnp.float32) * 1e-3

def mxu_body(c):
    return c @ c * 1e-3 + 1e-6

s = slope_time('mxu f32 matmul 4096', mxu_body, a0)
print(f'MXU f32(default): {2 * M**3 / s / 1e12:.1f} Tflop/s', flush=True)

b0 = jnp.ones((M, M), jnp.bfloat16) * 1e-3

def mxu_bf16_body(c):
    return (c @ c * jnp.bfloat16(1e-3) + jnp.bfloat16(1e-6))

s = slope_time('mxu bf16 matmul 4096', mxu_bf16_body, b0)
print(f'MXU bf16: {2 * M**3 / s / 1e12:.1f} Tflop/s', flush=True)
print('done', flush=True)
