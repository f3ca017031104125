"""Isolated Mosaic matmul-form experiments for the grad kernel's masked sums.

Each variant mimics the grad kernel's inner step: build a one-hot mask from
an id row, contract it with value planes, write [CHUNK, NP]-ish sums.
Finds which dot_general form compiles and how fast it runs.
"""
import time
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

CHUNK, PIX, NP = 128, 4096, 18
STEPS = 64   # grid steps to amortise
H = jax.lax.Precision.HIGHEST

rng = np.random.RandomState(0)
ids = jnp.asarray(rng.randint(0, CHUNK, size=(STEPS, 1, PIX)).astype(np.float32))
fid = jnp.asarray(np.broadcast_to(
    np.arange(CHUNK, dtype=np.float32)[:, None], (STEPS, CHUNK, 1)).copy())
v_pm = jnp.asarray(rng.randn(STEPS, PIX, NP).astype(np.float32))      # pixel-major
v_pm128 = jnp.asarray(rng.randn(STEPS, PIX, 128).astype(np.float32))  # padded N
v_rm = jnp.asarray(rng.randn(STEPS, NP, PIX).astype(np.float32))      # row-major


def timed(name, fn, *args):
    try:
        f = jax.jit(fn)
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        compile_s = time.perf_counter() - t0
        times = []
        for k in range(5):
            args2 = tuple(a + k * 1e-6 for a in args)
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args2))
            times.append(time.perf_counter() - t0)
        # per grid-step microseconds
        print(f'{name}: {min(times) / STEPS * 1e6:.1f} us/step '
              f'(compile {compile_s:.0f}s)', flush=True)
    except Exception as exc:
        print(name, 'FAILED:', type(exc).__name__, str(exc)[:150], flush=True)


def make(kernel, out_shape, *specs):
    in_specs = [pl.BlockSpec(s, functools.partial(lambda i, _s=None: 0, ),
                             memory_space=pltpu.VMEM) for s in specs]
    # index maps: step i selects row i of the leading dim
    in_specs = [pl.BlockSpec((1,) + s, lambda i: (i,) + (0,) * len(s),
                             memory_space=pltpu.VMEM) for s in specs]
    return pl.pallas_call(
        kernel,
        grid=(STEPS,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1,) + out_shape, lambda i: (i,) + (0,) * len(out_shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((STEPS,) + out_shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )


# T1: NN [CHUNK, PIX] @ [PIX, NP]
def k1(ids_ref, fid_ref, v_ref, out_ref):
    mask = (ids_ref[0] == fid_ref[0]).astype(jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        mask, v_ref[0], (((1,), (0,)), ((), ())), precision=H,
        preferred_element_type=jnp.float32)

timed('T1 NN [128,4096]@[4096,18]', make(k1, (CHUNK, NP), (1, PIX), (CHUNK, 1), (PIX, NP)),
      ids, fid, v_pm)

# T2: NN with N padded to 128
def k2(ids_ref, fid_ref, v_ref, out_ref):
    mask = (ids_ref[0] == fid_ref[0]).astype(jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        mask, v_ref[0], (((1,), (0,)), ((), ())), precision=H,
        preferred_element_type=jnp.float32)

timed('T2 NN [128,4096]@[4096,128]', make(k2, (CHUNK, 128), (1, PIX), (CHUNK, 1), (PIX, 128)),
      ids, fid, v_pm128)

# T3: S^T form: [NP, PIX] @ [PIX, CHUNK] with mask transposed via compare
def k3(ids_ref, fid_ref, v_ref, out_ref):
    # mask^T [PIX, CHUNK] from a transposed compare: ids as [1, PIX] ->
    # broadcast against fid [CHUNK, 1] then transpose the [CHUNK, PIX] mask.
    mask = (ids_ref[0] == fid_ref[0]).astype(jnp.float32)   # [CHUNK, PIX]
    mask_t = mask.T                                          # [PIX, CHUNK]
    out_ref[0] = jax.lax.dot_general(
        v_ref[0], mask_t, (((1,), (0,)), ((), ())), precision=H,
        preferred_element_type=jnp.float32)

timed('T3 [18,4096]@[4096,128] maskT', make(k3, (NP, CHUNK), (1, PIX), (CHUNK, 1), (NP, PIX)),
      ids, fid, v_rm)

# T4: NT baseline (known to compile, known slow)
def k4(ids_ref, fid_ref, v_ref, out_ref):
    mask = (ids_ref[0] == fid_ref[0]).astype(jnp.float32)
    out_ref[0] = jax.lax.dot_general(
        mask, v_ref[0], (((1,), (1,)), ((), ())), precision=H,
        preferred_element_type=jnp.float32)

timed('T4 NT [128,4096]@[18,4096]', make(k4, (CHUNK, NP), (1, PIX), (CHUNK, 1), (NP, PIX)),
      ids, fid, v_rm)

# T5: VPU masked reduction (no matmul): 18 reduces
def k5(ids_ref, fid_ref, v_ref, out_ref):
    mask = (ids_ref[0] == fid_ref[0])                       # [CHUNK, PIX] bool
    cols = [jnp.sum(jnp.where(mask, v_ref[0][i:i + 1, :], 0.0), axis=1,
                    keepdims=True) for i in range(NP)]
    out_ref[0] = jnp.concatenate(cols, axis=1)

timed('T5 VPU 18 masked reduces', make(k5, (CHUNK, NP), (1, PIX), (CHUNK, 1), (NP, PIX)),
      ids, fid, v_rm)

# T6: NN bf16 mask + bf16 values, f32 accum (quality probe only)
def k6(ids_ref, fid_ref, v_ref, out_ref):
    mask = (ids_ref[0] == fid_ref[0]).astype(jnp.bfloat16)
    out_ref[0] = jax.lax.dot_general(
        mask, v_ref[0].astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

timed('T6 NN bf16 [128,4096]@[4096,18]', make(k6, (CHUNK, NP), (1, PIX), (CHUNK, 1), (PIX, NP)),
      ids, fid, v_pm)

print('done', flush=True)
