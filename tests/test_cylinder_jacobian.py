"""Brute-force Jacobian checks on the bevelled-cylinder scene.

The reference's gradient harness (tests/rasterise_tests.py:50-145) renders a
procedural cylinder at 48x36 and extracts the full Jacobian wrt translation /
rotation / background colour / vertex colour with one-hot pixel cotangents,
judged by eye.  Here a sample of Jacobian rows is asserted against finite
differences: exactly for the linear parameters (colours, background) and
within filter-approximation tolerance for the geometric ones.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu import lighting, matrices
from dirt_tpu.utils import meshes

W, H = 48, 36


def _scene():
    vertices, faces = meshes.make_cylinder(0.2, 0.75, 0.1, 0., 10)
    vertices = np.concatenate(
        [vertices, np.ones([len(vertices), 1], np.float32)], axis=1)
    vertices, faces = lighting.split_vertices_by_face(
        jnp.asarray(vertices), jnp.asarray(faces))
    # Smoothly-shaded surface: high-frequency (random) colours make both the
    # filter-based gradients and the finite differences noisy, which is why
    # the reference only ever inspected these Jacobians visually.
    normals = lighting.vertex_normals_pre_split(vertices[..., :3], faces)
    vertex_colors = lighting.diffuse_directional(
        normals, jnp.ones_like(normals) * jnp.asarray([0.7, 0.3, 0.6]),
        light_direction=jnp.asarray([0.6, -0.5, -0.6]),
        light_color=jnp.asarray([1., 1., 1.])) * 0.8 + 0.2
    return vertices, faces, vertex_colors


def _render(vertices, faces, vertex_colors, translation, rotation_xy,
            bgcolor):
    c, s = jnp.cos(rotation_xy), jnp.sin(rotation_xy)
    view1 = jnp.array([
        [0.5, 0., 0., 0.], [0., 0.5, 0., 0.],
        [0., 0., 0.5, 0.], [0., 0., 0., 1.]]) @ jnp.stack([
            jnp.stack([c, -s, jnp.zeros(()), jnp.zeros(())]),
            jnp.stack([s, c, jnp.zeros(()), jnp.zeros(())]),
            jnp.array([0., 0., 1., 0.]),
            jnp.array([0., 0., 0., 1.])])
    view2 = matrices.translation(translation)
    projection = matrices.perspective_projection(0.1, 20., 0.2, float(H) / W)
    projected = vertices @ view1 @ view2 @ projection
    background = jnp.ones((H, W, 3)) * bgcolor
    return dirt_tpu.rasterise(background, projected, vertex_colors,
                              jnp.asarray(faces))


def test_jacobian_rows_background_color_exact():
    vertices, faces, vertex_colors = _scene()
    args = dict(translation=jnp.asarray([0., 0., -0.25]),
                rotation_xy=jnp.asarray(0.))

    def image(bg):
        return _render(vertices, faces, vertex_colors,
                       args["translation"], args["rotation_xy"], bg)

    bg0 = jnp.asarray([0.4, 0.2, 0.2])
    pixels, vjp = jax.vjp(image, bg0)
    covered = np.asarray(
        dirt_tpu.rasterise(jnp.zeros((H, W, 3)),
                           vertices @ jnp.eye(4), jnp.ones_like(vertex_colors),
                           jnp.asarray(faces)))
    rng = np.random.RandomState(1)
    for _ in range(4):
        y, x, ch = rng.randint(H), rng.randint(W), rng.randint(3)
        one_hot = jnp.zeros((H, W, 3)).at[y, x, ch].set(1.0)
        (g,) = vjp(one_hot)
        eps = 1e-2
        d = jnp.zeros(3).at[ch].set(eps)
        fd = (image(bg0 + d)[y, x, ch] - image(bg0 - d)[y, x, ch]) / (2 * eps)
        np.testing.assert_allclose(float(g[ch]), float(fd), atol=1e-4)
    del covered


def test_jacobian_rows_translation_approximate():
    vertices, faces, vertex_colors = _scene()

    def loss(translation):
        pixels = _render(vertices, faces, vertex_colors, translation,
                         jnp.asarray(0.), jnp.asarray([0.4, 0.2, 0.2]))
        # Smooth spatially-varying functional keeps the FD well-conditioned.
        wx = jnp.linspace(0., 1., W)[None, :, None]
        wy = jnp.linspace(0., 2., H)[:, None, None]
        return jnp.sum(pixels * (wx + wy))

    t0 = jnp.asarray([0., 0., -0.25])
    g = np.asarray(jax.grad(loss)(t0))
    for axis, step in [(0, 2. / W), (1, 2. / H)]:
        e = jnp.zeros(3).at[axis].set(step / 2)
        fd = (loss(t0 + e) - loss(t0 - e)) / step
        assert abs(fd) > 1e-2
        np.testing.assert_allclose(g[axis], float(fd), rtol=0.35)
    # z-translation changes scale (through w): gradient must be nonzero and
    # match the sign of the finite difference.
    e = jnp.zeros(3).at[2].set(0.02)
    fd_z = (loss(t0 + e) - loss(t0 - e)) / 0.04
    assert np.sign(g[2]) == np.sign(float(fd_z)) and abs(g[2]) > 1e-3


def test_rotation_gradient_descends_to_target():
    # A single-number FD check on rotation is quantisation noise at this
    # resolution (the loss is a step function of the angle), so assert the
    # property the gradients exist to provide: gradient descent on an
    # image-matching loss recovers a target rotation.
    vertices, faces, vertex_colors = _scene()
    target_angle = 0.45

    def render(rotation_xy):
        return _render(vertices, faces, vertex_colors,
                       jnp.asarray([0., 0., -0.25]), rotation_xy,
                       jnp.asarray([0.4, 0.2, 0.2]))

    target = render(jnp.asarray(target_angle))
    loss = lambda a: jnp.mean((render(a) - target) ** 2)
    grad = jax.jit(jax.grad(loss))

    angle = jnp.asarray(0.2)
    initial_error = abs(float(angle) - target_angle)
    for _ in range(30):
        angle = angle - 8.0 * grad(angle)
    final_error = abs(float(angle) - target_angle)
    assert final_error < 0.4 * initial_error, (float(angle), target_angle)


def test_pre_split_normals_render_identically():
    # The render-level assertion behind the reference's visual
    # tests/lighting_tests.py: a pre-split mesh lit with
    # vertex_normals_pre_split renders the same image as the same mesh lit
    # with the generic vertex_normals.
    vertices, faces = meshes.make_cylinder(0.3, 0.8, 0.1, 0.2, 12)
    vertices = jnp.asarray(np.concatenate(
        [vertices, np.ones([len(vertices), 1], np.float32)], axis=1))
    split_v, split_f = lighting.split_vertices_by_face(vertices, jnp.asarray(faces))

    n_generic = lighting.vertex_normals(split_v[..., :3], split_f)
    n_fast = lighting.vertex_normals_pre_split(split_v[..., :3], split_f)

    def shade_and_render(normals):
        colors = lighting.diffuse_directional(
            normals, jnp.ones_like(normals),
            light_direction=jnp.asarray([0.5, -0.5, -0.7]),
            light_color=jnp.asarray([1., 1., 1.]))
        view = matrices.translation(jnp.asarray([0., 0., -2.5]))
        proj = matrices.perspective_projection(0.1, 20., 0.2, float(H) / W)
        return dirt_tpu.rasterise(
            jnp.zeros((H, W, 3)), split_v @ view @ proj, colors, split_f)

    np.testing.assert_allclose(
        np.asarray(shade_and_render(n_generic)),
        np.asarray(shade_and_render(n_fast)), atol=1e-5)
