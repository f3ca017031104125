"""Asserting unit tests for dirt_tpu.matrices (row-vector convention)."""

import numpy as np
import jax
import jax.numpy as jnp

from dirt_tpu import matrices


def test_rodrigues_identity_at_zero():
    m = matrices.rodrigues(jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(m), np.eye(4), atol=1e-6)


def test_rodrigues_quarter_turn_about_z():
    # Row-vector convention: v @ R.  The reference follows the OpenCV
    # (column-vector) matrix layout (dirt/matrices.py:33-34), so applied to a
    # row vector it rotates by -theta: +x quarter-turned about +z gives -y.
    m = matrices.rodrigues(jnp.array([0., 0., np.pi / 2]), three_by_three=True)
    v = jnp.array([1., 0., 0.]) @ m
    np.testing.assert_allclose(np.asarray(v), [0., -1., 0.], atol=1e-6)


def test_rodrigues_orthonormal():
    rng = np.random.RandomState(0)
    vecs = rng.randn(5, 3).astype(np.float32)
    ms = matrices.rodrigues(vecs, three_by_three=True)
    prod = np.einsum('bij,bkj->bik', np.asarray(ms), np.asarray(ms))
    np.testing.assert_allclose(prod, np.tile(np.eye(3), (5, 1, 1)), atol=1e-5)


def test_rodrigues_gradient_finite_at_zero():
    g = jax.grad(lambda v: jnp.sum(matrices.rodrigues(v)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_translation_applies_to_points():
    m = matrices.translation(jnp.array([1., 2., 3.]))
    p = jnp.array([10., 20., 30., 1.]) @ m
    np.testing.assert_allclose(np.asarray(p), [11., 22., 33., 1.], atol=1e-6)


def test_scale():
    m = matrices.scale(jnp.array([2., 3., 4.]))
    p = jnp.array([1., 1., 1., 1.]) @ m
    np.testing.assert_allclose(np.asarray(p), [2., 3., 4., 1.], atol=1e-6)


def test_scale_batched():
    m = matrices.scale(jnp.ones((7, 3)) * 2.)
    assert m.shape == (7, 4, 4)
    np.testing.assert_allclose(np.asarray(m[3]), np.diag([2., 2., 2., 1.]))


def test_perspective_projection_near_far_planes():
    near, far = 0.1, 20.
    m = matrices.perspective_projection(near=near, far=far, right=0.1, aspect=1.)
    # A point on the near plane (camera looks down -z) maps to NDC z = -1.
    p_near = jnp.array([0., 0., -near, 1.]) @ m
    assert np.isclose(p_near[2] / p_near[3], -1., atol=1e-5)
    p_far = jnp.array([0., 0., -far, 1.]) @ m
    assert np.isclose(p_far[2] / p_far[3], 1., atol=1e-5)
    # w_clip equals the view-space depth (distance along -z).
    assert np.isclose(p_near[3], near, atol=1e-6)


def test_perspective_projection_frustum_edge():
    m = matrices.perspective_projection(near=0.1, far=20., right=0.2, aspect=0.5)
    # A point at the right frustum edge on the near plane maps to NDC x = +1.
    p = jnp.array([0.2, 0., -0.1, 1.]) @ m
    assert np.isclose(p[0] / p[3], 1., atol=1e-5)
    # Top edge: top = right * aspect.
    p = jnp.array([0., 0.1, -0.1, 1.]) @ m
    assert np.isclose(p[1] / p[3], 1., atol=1e-5)


def test_pad_3x3_to_4x4():
    m = matrices.pad_3x3_to_4x4(jnp.arange(9., dtype=jnp.float32).reshape(3, 3))
    expected = np.zeros((4, 4), np.float32)
    expected[:3, :3] = np.arange(9.).reshape(3, 3)
    expected[3, 3] = 1.
    np.testing.assert_array_equal(np.asarray(m), expected)


def test_compose_order():
    # compose(A, B) applies A first: v @ (A @ B).
    t = matrices.translation(jnp.array([1., 0., 0.]))
    s = matrices.scale(jnp.array([2., 2., 2.]))
    m = matrices.compose(t, s)  # translate then scale
    p = jnp.array([0., 0., 0., 1.]) @ m
    np.testing.assert_allclose(np.asarray(p[:3]), [2., 0., 0.], atol=1e-6)
    m2 = matrices.compose(s, t)  # scale then translate
    p2 = jnp.array([1., 0., 0., 1.]) @ m2
    np.testing.assert_allclose(np.asarray(p2[:3]), [3., 0., 0.], atol=1e-6)


def test_compose_empty_is_identity():
    np.testing.assert_array_equal(np.asarray(matrices.compose()), np.eye(4))
