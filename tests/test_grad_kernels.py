"""Pallas gradient kernels (chunk-dense, block-binned, MXU) vs XLA.

All implement the same analytic gradient assembly; they may differ only by
floating-point summation order (per-tile reductions / mask-matrix
contractions vs scatter-add), so comparisons use a tight relative tolerance.
"""

import numpy as np
import jax
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


@pytest.mark.parametrize("impl", ["xla", "dense", "blocks", "mxu"])
def test_parts_subsets_match_full(impl):
    # Round-5 deferred-path optimisation: parts="position"/"color" compute
    # the identical expression subtrees of parts="all" (reductions are
    # independent), so computed rows are BITWISE-equal and skipped rows
    # are zeros.  The deferred backward relies on this
    # (rasterise_ops._deferred_bwd passes parts to each of its two calls).
    rng = np.random.RandomState(17)
    nv, nf, h, w, batch = 64, 96, 48, 128, 2
    v = rng.randn(batch, nv, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, nv, size=(batch, nf, 3)).astype(np.int32)
    c = rng.uniform(size=(batch, nv, 3)).astype(np.float32)
    bg = rng.uniform(size=(batch, h, w, 3)).astype(np.float32)
    pixels, aux = dispatch.forward_batch(bg, v, c, f, "dense")
    gp = jnp.asarray(rng.randn(*np.asarray(pixels).shape), jnp.float32)

    g_all = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                          implementation=impl)
    g_pos = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                          implementation=impl,
                                          parts="position")
    g_col = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                          implementation=impl, parts="color")
    np.testing.assert_array_equal(np.asarray(g_pos.grad_vertices),
                                  np.asarray(g_all.grad_vertices))
    assert not np.asarray(g_pos.grad_vertex_colors).any()
    np.testing.assert_array_equal(np.asarray(g_col.grad_vertex_colors),
                                  np.asarray(g_all.grad_vertex_colors))
    np.testing.assert_array_equal(np.asarray(g_col.grad_background),
                                  np.asarray(g_all.grad_background))
    assert not np.asarray(g_col.grad_vertices).any()
    with pytest.raises(ValueError, match="unknown parts"):
        backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                      implementation=impl, parts="bogus")


def test_deferred_backward_matches_two_full_calls():
    # The parts-optimised deferred backward must produce exactly the
    # gradients of the two-full-call formulation it replaced.
    import dirt_tpu
    rng = np.random.RandomState(3)
    v = rng.randn(16, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 16, size=(10, 3)).astype(np.int32)
    attrs = rng.uniform(size=(16, 4)).astype(np.float32)
    bg = rng.uniform(size=(24, 128, 4)).astype(np.float32)
    light = jnp.asarray([0.8, 0.6, 0.4, 0.2])
    shader = lambda gb: jnp.tanh(gb * light)

    def loss(vv, aa):
        return jnp.sum(dirt_tpu.rasterise_deferred(
            bg, vv, aa, f, shader_fn=shader) ** 2)

    gv, ga = jax.grad(loss, argnums=(0, 1))(jnp.asarray(v),
                                            jnp.asarray(attrs))

    # Reference formulation: two parts="all" calls, discarding halves.
    from dirt_tpu.ops import dispatch as _dispatch
    gbuffer, aux = _dispatch.forward_batch(
        bg[None], jnp.asarray(v)[None], jnp.asarray(attrs)[None],
        jnp.asarray(f)[None])
    pixels = shader(gbuffer[0])[None]
    grad_pixels = (2 * pixels)
    _, ref_gv, _ = backward.rasterise_grad_grouped(
        jnp.asarray(v)[None], jnp.asarray(f)[None], pixels, grad_pixels,
        aux, parts="all")
    _, shader_vjp = jax.vjp(lambda gb: shader(gb), gbuffer)
    (grad_gbuffer,) = shader_vjp(grad_pixels)
    _, _, ref_ga = backward.rasterise_grad_grouped(
        jnp.asarray(v)[None], jnp.asarray(f)[None], gbuffer, grad_gbuffer,
        aux, parts="all")
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(ref_gv[0]))
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(ref_ga[0]))
