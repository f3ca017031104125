"""Deferred-shading correctness tests.

Ports the reference's direct-vs-deferred gradient comparison
(tests/deferred_grad_test.py) into asserting form.  The key semantic (comments
at dirt/rasterise_ops.py:204-213): vertex gradients must come from Scharr-
filtering the *shaded* image, while attribute/background gradients chain
through the shader; a naive pipeline (autodiff straight through
rasterise-then-shade) filters the G-buffer instead and yields different,
incorrect boundary gradients for any non-linear shader.
"""

import numpy as np
import jax
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu.ops import backward, dispatch
from dirt_tpu.utils import textures

H, W = 24, 32


def _scene():
    vertices = np.array([
        [-0.5, -0.5, 0., 1.],
        [-0.5, 0.5, 0., 1.],
        [0.5, 0.5, 0.4, 2.],
        [0.5, -0.5, 0.4, 2.],
    ], np.float32) * [1, 1, 1, 1]
    vertices[2:, :2] *= 2.0  # keep NDC position, scale clip x,y with w
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    rng = np.random.RandomState(0)
    attrs = rng.uniform(0.2, 0.9, size=(4, 3)).astype(np.float32)
    bg = rng.uniform(size=(H, W, 3)).astype(np.float32)
    return jnp.asarray(vertices), jnp.asarray(faces), jnp.asarray(attrs), jnp.asarray(bg)


def test_linear_shader_commutes_with_direct():
    # For a linear shader (matmul by M), deferred shading of attributes is
    # bit-identical to direct rasterisation of (attributes @ M): perspective-
    # correct interpolation is linear in attributes... up to one f32 rounding,
    # so compare with tight tolerance rather than exactly.
    vertices, faces, attrs, bg = _scene()
    m = jnp.asarray(np.random.RandomState(1).randn(3, 3).astype(np.float32))

    deferred = dirt_tpu.rasterise_deferred(
        bg, vertices, attrs, faces,
        shader_fn=lambda gbuffer, mat: gbuffer @ mat,
        shader_additional_inputs=[m])
    direct = dirt_tpu.rasterise(bg @ m, vertices, attrs @ m, faces)
    np.testing.assert_allclose(
        np.asarray(deferred), np.asarray(direct), atol=1e-5)


def test_deferred_vertex_grads_filter_shaded_image():
    # With a non-linear shader, the deferred vertex gradient must equal the
    # gradient assembly run on the *shaded* pixels -- and differ from the
    # naive pipeline's (which filters the G-buffer).
    vertices, faces, attrs, bg = _scene()
    weights = jnp.asarray(
        np.random.RandomState(2).randn(H, W, 3).astype(np.float32))
    shader = lambda gbuffer: gbuffer ** 2 + 0.1 * gbuffer

    def deferred_loss(v):
        return jnp.sum(dirt_tpu.rasterise_deferred(
            bg, v, attrs, faces, shader_fn=shader) * weights)

    g_deferred = np.asarray(jax.grad(deferred_loss)(vertices))

    # Manual construction of the correct gradient: grad op on shaded pixels.
    gbuffer, aux = dispatch.forward_batch(
        bg[None], vertices[None], attrs[None], faces[None])
    shaded = shader(gbuffer)
    _, g_manual, _ = backward.rasterise_grad_grouped(
        vertices[None], faces[None], shaded, weights[None], aux)
    np.testing.assert_allclose(g_deferred, np.asarray(g_manual[0]),
                               rtol=1e-5, atol=1e-6)

    # Naive pipeline: autodiff through rasterise, shader applied outside.
    def naive_loss(v):
        return jnp.sum(shader(dirt_tpu.rasterise(bg, v, attrs, faces))
                       * weights)

    g_naive = np.asarray(jax.grad(naive_loss)(vertices))
    assert not np.allclose(g_naive, g_deferred, rtol=0.05), \
        "naive and deferred vertex grads should differ for non-linear shaders"


def test_deferred_attribute_grads_chain_through_shader():
    # Attribute gradients flow through the shader's vjp, then the interior
    # (colour) gradient assembly.  For shader(g) = g @ M this equals the
    # direct gradient wrt colors (attrs @ M) chained by M^T.
    vertices, faces, attrs, bg = _scene()
    m = jnp.asarray(np.random.RandomState(1).randn(3, 3).astype(np.float32))
    weights = jnp.asarray(
        np.random.RandomState(3).randn(H, W, 3).astype(np.float32))

    def deferred_loss(a):
        return jnp.sum(dirt_tpu.rasterise_deferred(
            bg, vertices, a, faces,
            shader_fn=lambda gbuffer, mat: gbuffer @ mat,
            shader_additional_inputs=[m]) * weights)

    g_attrs = np.asarray(jax.grad(deferred_loss)(attrs))

    def direct_loss(colors):
        return jnp.sum(dirt_tpu.rasterise(
            bg @ m, vertices, colors, faces) * weights)

    g_colors = np.asarray(jax.grad(direct_loss)(attrs @ m))  # wrt attrs @ M
    np.testing.assert_allclose(g_attrs, g_colors @ np.asarray(m).T,
                               rtol=1e-4, atol=1e-5)


def test_shader_additional_input_gradient():
    vertices, faces, attrs, bg = _scene()
    light = jnp.asarray([0.8, 0.6, 0.4])

    def loss(light_color):
        pixels = dirt_tpu.rasterise_deferred(
            bg, vertices, attrs, faces,
            shader_fn=lambda gbuffer, lc: gbuffer * lc,
            shader_additional_inputs=[light_color])
        return jnp.sum(pixels ** 2)

    g = np.asarray(jax.grad(loss)(light))
    eps = 1e-3
    for c in range(3):
        d = jnp.zeros(3).at[c].set(eps)
        fd = (loss(light + d) - loss(light - d)) / (2 * eps)
        np.testing.assert_allclose(g[c], float(fd), rtol=5e-3)


def test_closed_over_tensor_gradient_matches_additional_inputs():
    # SURVEY.md section 7 promise: shader_fn may close over traced tensors
    # and still get correct gradients for them (the reference needs the
    # `variables` kwarg of tf.custom_gradient for this,
    # dirt/rasterise_ops.py:202,216-229).  jax.closure_convert lifts the
    # closed-over tracer into an explicit custom_vjp input.
    vertices, faces, attrs, bg = _scene()
    light = jnp.asarray([0.8, 0.6, 0.4])

    def loss_closure(light_color):
        pixels = dirt_tpu.rasterise_deferred(
            bg, vertices, attrs, faces,
            shader_fn=lambda gbuffer: gbuffer ** 2 * light_color)
        return jnp.sum(pixels ** 2)

    def loss_inputs(light_color):
        pixels = dirt_tpu.rasterise_deferred(
            bg, vertices, attrs, faces,
            shader_fn=lambda gbuffer, lc: gbuffer ** 2 * lc,
            shader_additional_inputs=[light_color])
        return jnp.sum(pixels ** 2)

    g_closure = np.asarray(jax.grad(loss_closure)(light))
    g_inputs = np.asarray(jax.grad(loss_inputs)(light))
    assert np.abs(g_inputs).sum() > 1e-3
    np.testing.assert_allclose(g_closure, g_inputs, rtol=1e-6)
    # And under jit (the closure value is a jit tracer there).
    g_jit = np.asarray(jax.jit(jax.grad(loss_closure))(light))
    np.testing.assert_allclose(g_jit, g_inputs, rtol=1e-5, atol=1e-7)


def test_closed_over_vertices_get_boundary_gradients():
    # The lifted closure input takes the full deferred gradient path: a
    # traced tensor used *inside* the shader gets the shader-chain
    # gradient even when also fed to the rasteriser outside the closure.
    vertices, faces, attrs, bg = _scene()
    gain = jnp.asarray(1.7)

    def loss(g):
        pixels = dirt_tpu.rasterise_deferred(
            bg, vertices, attrs, faces,
            shader_fn=lambda gbuffer: jnp.tanh(gbuffer * g))
        return jnp.sum(pixels)

    grad = float(jax.grad(loss)(gain))
    eps = 1e-3
    fd = (loss(gain + eps) - loss(gain - eps)) / (2 * eps)
    np.testing.assert_allclose(grad, float(fd), rtol=1e-3)


def test_closure_combines_with_additional_inputs_and_int_closures():
    # The closure_convert lift composes with explicit shader inputs in the
    # same shader (gradients flow on both routes at once), and closing
    # over a non-differentiable int array is harmless (its cotangent is a
    # symbolic zero).
    vertices, faces, attrs, bg = _scene()
    light = jnp.asarray([0.8, 0.6, 0.4])
    gain = jnp.asarray(1.3)

    def loss(gain_, light_):
        pixels = dirt_tpu.rasterise_deferred(
            bg, vertices, attrs, faces,
            shader_fn=lambda gb, lc: jnp.tanh(gb * gain_) * lc,
            shader_additional_inputs=[light_])
        return jnp.sum(pixels ** 2)

    g_gain, g_light = jax.grad(loss, argnums=(0, 1))(gain, light)
    eps = 1e-3
    fd = (loss(gain + eps, light) - loss(gain - eps, light)) / (2 * eps)
    np.testing.assert_allclose(float(g_gain), float(fd), rtol=1e-2)
    assert np.abs(np.asarray(g_light)).sum() > 1e-4

    sel = jnp.asarray([0, 1, 2], jnp.int32)

    def loss_int(light_):
        pixels = dirt_tpu.rasterise_deferred(
            bg, vertices, attrs, faces,
            shader_fn=lambda gb: gb[..., sel] * light_[None, None])
        return jnp.sum(pixels ** 2)

    g2 = np.asarray(jax.grad(loss_int)(light))
    assert np.isfinite(g2).all() and np.abs(g2).sum() > 0


def test_batch_deferred_matches_single():
    vertices, faces, attrs, bg = _scene()
    shader = lambda gbuffer: jnp.sqrt(jnp.abs(gbuffer) + 0.1)
    single = dirt_tpu.rasterise_deferred(
        bg, vertices, attrs, faces, shader_fn=shader)
    batched = dirt_tpu.rasterise_batch_deferred(
        jnp.stack([bg, bg]), jnp.stack([vertices, vertices]),
        jnp.stack([attrs, attrs]), jnp.stack([faces, faces]),
        shader_fn=shader)
    np.testing.assert_array_equal(np.asarray(batched[0]), np.asarray(single))
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(single))


def test_textured_deferred_uv_and_texture_gradients():
    # UV attributes rasterised into the G-buffer, texture sampled in the
    # shader: gradients must flow to the texture (exact-ish: sampling is
    # piecewise linear) and to the UVs.
    vertices, faces, _, _ = _scene()
    uvs = jnp.asarray(np.array(
        [[0.1, 0.1], [0.1, 0.8], [0.8, 0.8], [0.8, 0.1]], np.float32))
    texture = jnp.asarray(
        np.random.RandomState(5).uniform(size=(16, 16, 3)).astype(np.float32))
    bg_uv = jnp.zeros((H, W, 2))

    def shader(gbuffer, tex):
        idx = textures.uvs_to_pixel_indices(gbuffer, jnp.asarray(tex.shape[:2]))
        return textures.sample_texture(tex, idx)

    def loss(tex, uv):
        pixels = dirt_tpu.rasterise_deferred(
            bg_uv, vertices, uv, faces, shader_fn=shader,
            shader_additional_inputs=[tex])
        return jnp.sum(pixels * jnp.linspace(0., 1., W)[None, :, None])

    g_tex, g_uv = jax.grad(loss, argnums=(0, 1))(texture, uvs)
    assert float(jnp.abs(g_tex).sum()) > 0.1
    assert float(jnp.abs(g_uv).sum()) > 1e-3
    # FD check on one texel (pixels are linear in the texture).
    eps = 1e-2
    delta = jnp.zeros_like(texture).at[8, 8, 1].add(eps)
    fd = (loss(texture + delta, uvs) - loss(texture - delta, uvs)) / (2 * eps)
    np.testing.assert_allclose(float(g_tex[8, 8, 1]), float(fd),
                               rtol=5e-3, atol=1e-4)
