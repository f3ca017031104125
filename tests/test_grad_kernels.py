"""Pallas gradient kernels (chunk-dense, block-binned, MXU) vs XLA.

All implement the same analytic gradient assembly; they may differ only by
floating-point summation order (per-tile reductions / mask-matrix
contractions vs scatter-add), so comparisons use a tight relative tolerance.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import backward, dispatch, grad_dense, grad_mxu
from dirt_tpu.utils import meshes

KERNELS = [grad_dense, grad_mxu]


def _compare(vertices, faces, colors, background, grad_pixels,
             kernels=KERNELS):
    pixels, aux = dispatch.forward_batch(
        background, vertices, colors, faces, backend="reference")
    g_xla = backward.rasterise_grad_batch(
        vertices, faces, pixels, grad_pixels, aux, implementation="xla")
    for kernel in kernels:
        g_pal = kernel.rasterise_grad_batch(
            vertices, faces, pixels, grad_pixels, aux, interpret=True)
        np.testing.assert_array_equal(np.asarray(g_xla.grad_background),
                                      np.asarray(g_pal.grad_background))
        for name in ("grad_vertices", "grad_vertex_colors"):
            a = np.asarray(getattr(g_xla, name))
            b = np.asarray(getattr(g_pal, name))
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=3e-6,
                err_msg=f"{name} ({kernel.__name__})")


def test_zero_faces_passthrough():
    rng = np.random.RandomState(5)
    v = jnp.asarray(rng.randn(1, 7, 4).astype(np.float32))
    f = jnp.zeros((1, 0, 3), jnp.int32)
    colors = jnp.asarray(rng.uniform(size=(1, 7, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)).astype(np.float32))
    gp = jnp.asarray(rng.randn(1, 16, 32, 3).astype(np.float32))
    _compare(v, f, colors, bg, gp)


def test_occlusion_scene_grads_match():
    rng = np.random.RandomState(0)
    verts, faces, front, back = meshes.two_squares(
        front_depth=0.0, back_depth=0.5, size=0.8, back_size=0.9)
    batch = 2
    v = jnp.asarray(np.stack([verts, verts + [0.05, 0., 0., 0.]]))
    f = jnp.asarray(np.stack([faces, faces]))
    colors = jnp.asarray(rng.uniform(size=(batch, 8, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(batch, 32, 48, 3)).astype(np.float32))
    gp = jnp.asarray(rng.randn(batch, 32, 48, 3).astype(np.float32))
    _compare(v, f, colors, bg, gp)


@pytest.mark.parametrize("channels", [1, 3])
def test_random_soup_grads_match(channels):
    rng = np.random.RandomState(3)
    v = rng.randn(1, 40, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 40, size=(1, 30, 3)).astype(np.int32)
    colors = rng.uniform(size=(1, 40, channels)).astype(np.float32)
    bg = rng.uniform(size=(1, 40, 72, channels)).astype(np.float32)
    gp = rng.randn(1, 40, 72, channels).astype(np.float32)
    _compare(jnp.asarray(v), jnp.asarray(f), jnp.asarray(colors),
             jnp.asarray(bg), jnp.asarray(gp))


def test_many_faces_multiple_chunks_grads_match(monkeypatch):
    monkeypatch.setattr(grad_mxu, "CHUNK", 64)
    monkeypatch.setattr(grad_dense, "CHUNK", 32)
    rng = np.random.RandomState(11)
    n = 140
    centres = rng.uniform(-0.9, 0.9, size=(n, 2)).astype(np.float32)
    tri = np.stack([centres, centres + [0.2, 0.], centres + [0., 0.2]], axis=1)
    depth = rng.uniform(-0.5, 0.5, size=(n, 1, 1)).astype(np.float32)
    v = np.concatenate([
        tri, np.broadcast_to(depth, (n, 3, 1)),
        np.ones((n, 3, 1), np.float32)], axis=-1).reshape(1, n * 3, 4)
    f = np.arange(n * 3, dtype=np.int32).reshape(1, n, 3)
    colors = rng.uniform(size=(1, n * 3, 3)).astype(np.float32)
    bg = np.zeros((1, 64, 128, 3), np.float32)
    gp = rng.randn(1, 64, 128, 3).astype(np.float32)
    _compare(jnp.asarray(v), jnp.asarray(f), jnp.asarray(colors),
             jnp.asarray(bg), jnp.asarray(gp))


def test_deferred_path_with_dense_grads(monkeypatch):
    # End-to-end deferred shading with the production dense gradient kernel
    # (interpret mode on CPU) selected via the env knob.
    import jax
    import dirt_tpu
    monkeypatch.setenv("DIRT_TPU_GRAD_BACKEND", "dense")
    rng = np.random.RandomState(0)
    verts, faces, front, back = meshes.two_squares()
    attrs = jnp.asarray(rng.uniform(size=(8, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(24, 32, 3)).astype(np.float32))
    shader = lambda g: g ** 2 + 0.1 * g

    def loss(a):
        return jnp.sum(dirt_tpu.rasterise_deferred(
            bg, jnp.asarray(verts), a, jnp.asarray(faces), shader_fn=shader))

    g_dense = np.asarray(jax.grad(loss)(attrs))
    monkeypatch.setenv("DIRT_TPU_GRAD_BACKEND", "xla")
    g_xla = np.asarray(jax.grad(loss)(attrs))
    np.testing.assert_allclose(g_dense, g_xla, rtol=1e-4, atol=1e-5)


def test_blocks_grads_match_xla(monkeypatch):
    # Block-binned gradient kernel (ops/grad_blocks.py) vs the XLA path,
    # with CHUNK shrunk so the scene spans several face blocks.
    from dirt_tpu.ops import grad_blocks
    monkeypatch.setattr(grad_blocks, "CHUNK", 16)
    rng = np.random.RandomState(13)
    v = rng.randn(2, 60, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 60, size=(2, 45, 3)).astype(np.int32)
    c = rng.uniform(size=(2, 60, 3)).astype(np.float32)
    bg = rng.uniform(size=(2, 64, 128, 3)).astype(np.float32)
    gp = rng.randn(2, 64, 128, 3).astype(np.float32)
    px, aux = dispatch.forward_batch(bg, v, c, f, backend="reference")
    g_xla = backward.rasterise_grad_batch(v, f, px, gp, aux,
                                          implementation="xla")
    g_blk = backward.rasterise_grad_batch(v, f, px, gp, aux,
                                          implementation="blocks")
    for name in ("grad_vertices", "grad_vertex_colors", "grad_background"):
        a = np.asarray(getattr(g_xla, name))
        b = np.asarray(getattr(g_blk, name))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)
