"""Localise the 65,536-face parity failure (512^2, image 0) on device."""
import os
import numpy as np
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import bench as B
from dirt_tpu.ops import dispatch
from dirt_tpu.utils import oracle

bg, clip, colors, faces, _ = B.build_scene(1, 512, 8192)
print("faces:", faces.shape, flush=True)
want_px, want_idx = oracle.rasterise(
    np.asarray(bg[0]), np.asarray(clip[0]), np.asarray(colors[0]),
    np.asarray(faces[0]))
print("oracle done; covered px:", int((want_idx >= 0).sum()), flush=True)

for backend in ("dense", "blocks"):
    px, aux = jax.jit(lambda b, v, c, f, _bk=backend: dispatch.forward_batch(
        b, v, c, f, backend=_bk))(bg, clip, colors, faces)
    got_idx = np.asarray(aux.face_index[0])
    bad = got_idx != want_idx
    dpx = np.abs(np.asarray(px[0]) - want_px).max()
    print(f"{backend}: idx_mismatch={int(bad.sum())} max|dpx|={dpx:.3e}",
          flush=True)
    if bad.any():
        ys, xs = np.nonzero(bad)
        for y, x in list(zip(ys, xs))[:8]:
            print(f"  ({y},{x}) got={got_idx[y,x]} want={want_idx[y,x]} "
                  f"tile=({y//32},{x//128})", flush=True)
print("done", flush=True)
