"""Large-mesh scaling: the per-tile face cap keeps binning memory bounded.

Exact per-tile binning replicates the face table per tile, which is
O(tiles x faces x row-size) memory; beyond DIRT_TPU_TILE_FACE_CAP faces each
tile keeps only its first `cap` hitting faces in draw order
(forward_pallas.tile_face_cap).  These tests pin:

  * correctness is unchanged when the cap is ABOVE every tile's live count
    (the common case for real meshes -- faces cluster, tiles see a slice);
  * the kernels run and match the reference backend with thousands of faces
    while the cap bounds the materialised face table.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import backward, dispatch, forward_pallas, grad_mxu
from dirt_tpu.utils import meshes


def _tri_grid(n_side, size, rng):
    """n_side^2 small triangles scattered over the screen."""
    n = n_side * n_side
    gx, gy = np.meshgrid(np.linspace(-0.95, 0.8, n_side),
                         np.linspace(-0.95, 0.8, n_side))
    centres = np.stack([gx.ravel(), gy.ravel()], axis=-1).astype(np.float32)
    centres += rng.uniform(-0.01, 0.01, centres.shape).astype(np.float32)
    tri = np.stack([centres, centres + [size, 0.], centres + [0., size]],
                   axis=1)
    depth = rng.uniform(-0.5, 0.5, size=(n, 1, 1)).astype(np.float32)
    v = np.concatenate([
        tri, np.broadcast_to(depth, (n, 3, 1)),
        np.ones((n, 3, 1), np.float32)], axis=-1).reshape(1, n * 3, 4)
    f = np.arange(n * 3, dtype=np.int32).reshape(1, n, 3)
    return v, f


def test_cap_inactive_matches_uncapped(monkeypatch):
    rng = np.random.RandomState(0)
    v, f = _tri_grid(12, 0.1, rng)         # 144 faces
    c = rng.uniform(size=(1, f.shape[1] * 3, 3)).astype(np.float32)
    bg = np.zeros((1, 64, 128, 3), np.float32)

    base, aux_base = dispatch.forward_batch(bg, v, c, f, backend="pallas")
    # A cap above every tile's live count (the 64x128 image has only two
    # 32x128 tiles, each seeing ~half the 144 faces) but below the total
    # face count, so the capped packing path is exercised.
    monkeypatch.setenv("DIRT_TPU_TILE_FACE_CAP", "128")
    monkeypatch.setattr(forward_pallas, "CHUNK", 32)
    capped, aux_capped = dispatch.forward_batch(bg, v, c, f, backend="pallas")
    np.testing.assert_array_equal(np.asarray(aux_base.face_index),
                                  np.asarray(aux_capped.face_index))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(capped))


def test_thousands_of_faces_parity_under_cap(monkeypatch):
    # 1024 faces with a 384-face cap: each 32x128 tile of the 128x256 image
    # sees far fewer than 384 faces, so results stay exact while the
    # materialised face table is ~a third of the uncapped size.
    monkeypatch.setenv("DIRT_TPU_TILE_FACE_CAP", "384")
    rng = np.random.RandomState(1)
    v, f = _tri_grid(32, 0.05, rng)        # 1024 faces
    c = rng.uniform(size=(1, f.shape[1] * 3, 3)).astype(np.float32)
    bg = rng.uniform(size=(1, 128, 256, 3)).astype(np.float32)

    ref, aux_r = dispatch.forward_batch(bg, v, c, f, backend="reference")
    for backend in ("pallas", "dense"):
        px, aux = dispatch.forward_batch(bg, v, c, f, backend=backend)
        np.testing.assert_array_equal(np.asarray(aux.face_index),
                                      np.asarray(aux_r.face_index),
                                      err_msg=backend)
        np.testing.assert_allclose(np.asarray(px), np.asarray(ref),
                                   atol=1e-4, rtol=1e-5, err_msg=backend)

    # Gradient kernels under the cap match the (uncapped) XLA path.
    gp = jnp.asarray(rng.randn(*bg.shape).astype(np.float32))
    g_xla = backward.rasterise_grad_batch(
        jnp.asarray(v), jnp.asarray(f), ref, gp, aux_r, implementation="xla")
    g_mxu = grad_mxu.rasterise_grad_batch(
        jnp.asarray(v), jnp.asarray(f), ref, gp, aux_r, interpret=True)
    for name in ("grad_vertices", "grad_vertex_colors"):
        a = np.asarray(getattr(g_xla, name))
        b = np.asarray(getattr(g_mxu, name))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)


def test_blocks_backend_scattered_mesh(monkeypatch):
    # The CSR block-binned backend on a scattered triangle grid: draw order
    # zig-zags over the screen (low spatial coherence), so per-tile block
    # lists are long relative to their face counts -- the stressing shape
    # for block-granularity binning.  Visibility must still match the
    # reference exactly.
    from dirt_tpu.ops import forward_blocks
    monkeypatch.setattr(forward_blocks, "CHUNK", 32)
    rng = np.random.RandomState(5)
    v, f = _tri_grid(32, 0.05, rng)                 # 1024 faces
    c = rng.uniform(size=(1, v.shape[1], 3)).astype(np.float32)
    bg = rng.uniform(size=(1, 64, 128, 3)).astype(np.float32)
    px_b, aux_b = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    px_r, aux_r = dispatch.forward_batch(bg, v, c, f, backend="reference")
    np.testing.assert_array_equal(np.asarray(aux_b.face_index),
                                  np.asarray(aux_r.face_index))
    np.testing.assert_allclose(np.asarray(px_b), np.asarray(px_r),
                               atol=1e-4, rtol=1e-5)
    g_b = backward.rasterise_grad_batch(
        v, f, px_b, np.ones_like(np.asarray(px_b)), aux_b,
        implementation="blocks")
    g_x = backward.rasterise_grad_batch(
        v, f, px_b, np.ones_like(np.asarray(px_b)), aux_b,
        implementation="xla")
    for name in ("grad_vertices", "grad_vertex_colors", "grad_background"):
        a = np.asarray(getattr(g_x, name))
        b = np.asarray(getattr(g_b, name))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=name)
