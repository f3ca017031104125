"""Gradient-correctness tests for the filter-based analytic backward pass.

The reference establishes gradient *semantics* via manual visual harnesses
(tests/rasterise_tests.py brute-force Jacobians, judged by eye).  Here they
become asserting tests:

  * colour / background gradients are exact linear maps -> finite differences
    must agree tightly;
  * position gradients are Scharr-filter approximations -> finite differences
    over ~1px steps must agree within a tolerance;
  * occlusion-boundary gradients must flow to the occluder, not the occludee
    (the dilation behaviour of rasterise_grad_egl.cu:153-194).
"""

import numpy as np
import jax
import jax.numpy as jnp

import dirt_tpu

H, W = 32, 48


def _square(cx, cy, half, z, w):
    return np.array([
        [cx - half, cy - half, z, w],
        [cx - half, cy + half, z, w],
        [cx + half, cy + half, z, w],
        [cx + half, cy - half, z, w],
    ], np.float32) * [w, w, 1, 1]  # clip coords: ndc * w


def _render_translated(t, vertices, faces, colors, channels=3):
    shifted = vertices + jnp.concatenate(
        [t * vertices[..., 3:], jnp.zeros((vertices.shape[0], 2))], axis=-1)
    return dirt_tpu.rasterise(
        jnp.zeros((H, W, channels)), shifted, colors, faces)


def test_background_gradient_exact():
    vertices = jnp.asarray(_square(0., 0., 0.4, 0., 1.))
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    colors = jnp.ones((4, 1))

    def loss(background):
        pixels = dirt_tpu.rasterise(background, vertices, colors, faces)
        return jnp.sum(pixels * jnp.arange(H * W).reshape(H, W, 1))

    g = jax.grad(loss)(jnp.zeros((H, W, 1)))
    pixels = dirt_tpu.rasterise(jnp.zeros((H, W, 1)), vertices, colors, faces)
    covered = np.asarray(pixels[..., 0]) > 0
    expected = np.where(covered, 0., np.arange(H * W).reshape(H, W))
    np.testing.assert_array_equal(np.asarray(g[..., 0]), expected)


def test_vertex_color_gradient_matches_finite_difference():
    # Pixel values are exactly linear in vertex colours, so the analytic
    # gradient (bary-weighted scatter) must match finite differences tightly.
    rng = np.random.RandomState(0)
    vertices = jnp.asarray(_square(-0.1, 0.2, 0.5, 0.1, 1.3))
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    colors0 = jnp.asarray(rng.uniform(size=(4, 3)).astype(np.float32))
    weights = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))

    def loss(colors):
        return jnp.sum(dirt_tpu.rasterise(
            jnp.zeros((H, W, 3)), vertices, colors, faces) * weights)

    g = np.asarray(jax.grad(loss)(colors0))
    eps = 1e-2
    for v, c in [(0, 0), (1, 2), (3, 1)]:
        delta = np.zeros((4, 3), np.float32)
        delta[v, c] = eps
        fd = (loss(colors0 + delta) - loss(colors0 - delta)) / (2 * eps)
        np.testing.assert_allclose(g[v, c], float(fd), rtol=2e-3, atol=1e-3)


def test_translation_gradient_matches_finite_difference():
    # Boundary gradients are filter-based approximations: compare against a
    # half-pixel finite difference of the rendered loss with loose tolerance.
    vertices = jnp.asarray(_square(-0.1, 0.1, 0.45, 0., 1.))
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    colors = jnp.ones((4, 3)) * jnp.asarray([0.9, 0.5, 0.2])
    # Weights must vary along BOTH axes or the finite difference of a pure
    # y-shift is exactly zero.
    weights = jnp.asarray(
        (np.linspace(0, 1, W, dtype=np.float32)[None, :, None]
         + 2.0 * np.linspace(0, 1, H, dtype=np.float32)[:, None, None])
        * np.ones((1, 1, 3), np.float32))

    def loss(t):
        return jnp.sum(_render_translated(t, vertices, faces, colors) * weights)

    g = jax.grad(loss)(jnp.zeros(2))
    for axis, step in enumerate([2.0 / W, 2.0 / H]):  # one pixel per axis
        e = jnp.zeros(2).at[axis].set(step / 2)
        fd = (loss(e) - loss(-e)) / step
        assert np.isfinite(fd) and abs(fd) > 1e-3
        # Filter-based gradients are approximations; agree within ~30% on
        # sign and magnitude against a one-pixel finite difference.
        np.testing.assert_allclose(float(g[axis]), float(fd), rtol=0.3)


def test_occlusion_boundary_gradient_goes_to_occluder():
    # A small near square (clip w = 1) in front of a huge far square
    # (clip w = 2) that fills the frame.  All visible boundary structure
    # belongs to the occluder; thanks to dilation the position gradients of
    # the hidden surface must be (near) zero and the occluder's substantial.
    front = _square(0., 0., 0.4, 0., 1.)
    back = _square(0., 0., 4.0, 0.5, 2.)   # z/w = 0.25 behind front's 0
    vertices = jnp.asarray(np.concatenate([front, back], axis=0))
    faces = jnp.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], jnp.int32)
    colors = jnp.asarray(np.array(
        [[1., 0., 0.]] * 4 + [[0., 1., 0.]] * 4, np.float32))
    weights = jnp.asarray(
        np.random.RandomState(3).randn(H, W, 3).astype(np.float32))

    def loss(v):
        return jnp.sum(dirt_tpu.rasterise(
            jnp.zeros((H, W, 3)), v, colors, faces) * weights)

    g = np.asarray(jax.grad(loss)(vertices))
    front_norm = np.abs(g[:4]).sum()
    back_norm = np.abs(g[4:]).sum()
    assert front_norm > 1.0
    # The occludee's edges are entirely hidden or off-screen: its position
    # gradient must be far smaller than the occluder's.
    assert back_norm < 0.05 * front_norm, (front_norm, back_norm)


def test_batch_gradients_match_stacked_singles():
    rng = np.random.RandomState(5)
    v0 = _square(-0.2, 0., 0.4, 0., 1.)
    v1 = _square(0.3, 0.1, 0.3, 0., 1.)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    colors = rng.uniform(size=(2, 4, 3)).astype(np.float32)
    weights = rng.randn(2, H, W, 3).astype(np.float32)
    batch_v = jnp.asarray(np.stack([v0, v1]))

    def batch_loss(v):
        return jnp.sum(dirt_tpu.rasterise_batch(
            jnp.zeros((2, H, W, 3)), v, jnp.asarray(colors),
            jnp.asarray(np.stack([faces, faces]))) * jnp.asarray(weights))

    g_batch = np.asarray(jax.grad(batch_loss)(batch_v))

    for i, vi in enumerate([v0, v1]):
        def single_loss(v):
            return jnp.sum(dirt_tpu.rasterise(
                jnp.zeros((H, W, 3)), v, jnp.asarray(colors[i]),
                jnp.asarray(faces)) * jnp.asarray(weights[i]))
        g_single = np.asarray(jax.grad(single_loss)(jnp.asarray(vi)))
        np.testing.assert_array_equal(g_batch[i], g_single)


def test_no_gradient_to_clip_z():
    # The reference never writes grad_vertices[..., 2]
    # (rasterise_grad_egl.cu:228-230 touches only components 0, 1, 3).
    vertices = jnp.asarray(_square(0., 0., 0.4, 0.3, 1.))
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    g = jax.grad(lambda v: jnp.sum(dirt_tpu.rasterise(
        jnp.zeros((H, W, 1)), v, jnp.ones((4, 1)), faces) ** 2))(vertices)
    np.testing.assert_array_equal(np.asarray(g[:, 2]), np.zeros(4))


def test_gradients_work_through_pallas_backend():
    vertices = jnp.asarray(_square(0., 0., 0.4, 0., 1.))
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    weights = jnp.asarray(
        np.random.RandomState(9).randn(H, W, 1).astype(np.float32))

    def loss(v, backend):
        return jnp.sum(dirt_tpu.rasterise(
            jnp.zeros((H, W, 1)), v, jnp.ones((4, 1)), faces,
            backend=backend) * weights)

    g_pallas = np.asarray(jax.grad(loss)(vertices, "pallas"))
    g_ref = np.asarray(jax.grad(loss)(vertices, "reference"))
    np.testing.assert_allclose(g_pallas, g_ref, rtol=1e-3, atol=1e-4)
