"""Device validation + timing for the block-binned kernels."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import bench as B
from dirt_tpu.ops import backward, dispatch

# 1. grad parity on device: blocks vs dense at 8192 faces, 256^2, b2.
bg, clip, colors, faces, _ = B.build_scene(2, 256, 1024)
rng = np.random.RandomState(5)
gp = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
px, aux = jax.jit(lambda b, v, c, f: dispatch.forward_batch(
    b, v, c, f, backend="blocks"))(bg, clip, colors, faces)
g_dense = jax.jit(lambda v, f, p, g: backward.rasterise_grad_batch(
    v, f, p, g, aux, implementation="dense"))(clip, faces, px, gp)
g_blk = jax.jit(lambda v, f, p, g: backward.rasterise_grad_batch(
    v, f, p, g, aux, implementation="blocks"))(clip, faces, px, gp)
for name in ("grad_vertices", "grad_vertex_colors", "grad_background"):
    a = np.asarray(getattr(g_dense, name))
    b = np.asarray(getattr(g_blk, name))
    scale = max(np.abs(a).max(), 1.0)
    err = np.abs(a / scale - b / scale).max()
    print(f"8192f grad blocks-vs-dense {name}: rel err {err:.2e}", flush=True)
    assert err < 1e-5, name
print("grad blocks device parity OK", flush=True)
