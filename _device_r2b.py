"""One-process device pass: block-kernel parity (fwd+grad) then the sweep."""
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import bench as B
from dirt_tpu.ops import backward, dispatch
import _sweep_r2 as S

bg, clip, colors, faces, _ = B.build_scene(2, 256, 1024)   # 8192 faces
rng = np.random.RandomState(5)
gp = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
px_b, aux_b = jax.jit(lambda b, v, c, f: dispatch.forward_batch(
    b, v, c, f, backend="blocks"))(bg, clip, colors, faces)
px_d, aux_d = jax.jit(lambda b, v, c, f: dispatch.forward_batch(
    b, v, c, f, backend="dense"))(bg, clip, colors, faces)
nbad = int((np.asarray(aux_b.face_index) != np.asarray(aux_d.face_index)).sum())
print(f"8192f fwd blocks-vs-dense idx mismatches: {nbad}", flush=True)
assert nbad == 0
g_dense = jax.jit(lambda v, f, p, g: backward.rasterise_grad_batch(
    v, f, p, g, aux_b, implementation="dense"))(clip, faces, px_b, gp)
g_blk = jax.jit(lambda v, f, p, g: backward.rasterise_grad_batch(
    v, f, p, g, aux_b, implementation="blocks"))(clip, faces, px_b, gp)
for name in ("grad_vertices", "grad_vertex_colors", "grad_background"):
    a = np.asarray(getattr(g_dense, name))
    b = np.asarray(getattr(g_blk, name))
    scale = max(np.abs(a).max(), 1.0)
    err = np.abs(a / scale - b / scale).max()
    print(f"8192f grad blocks-vs-dense {name}: rel err {err:.2e}", flush=True)
    assert err < 1e-5, name
print("blocks device parity OK; sweeping", flush=True)

S.run(16, 128, 64)
S.run(16, 256, 64)
S.run(4, 512, 64)
S.run(16, 256, 256)
S.run(16, 256, 1024, iters=5)
S.run(4, 512, 8192, iters=3)
print('done', flush=True)
