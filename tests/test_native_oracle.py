"""JAX backends vs the independent native C++ oracle.

Random scenes have measure-zero probability of exactly-on-edge pixel centres
or exact depth ties, so the strictly-rounded (-ffp-contract=off) C++ oracle
and the XLA/Pallas backends must agree bit-for-bit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu.ops import dispatch
from dirt_tpu.utils import meshes, oracle


def _random_scene(seed, num_vertices=50, num_faces=35, h=40, w=56, c=3):
    rng = np.random.RandomState(seed)
    v = rng.randn(num_vertices, 4).astype(np.float32)
    v[:, 3] = np.abs(v[:, 3]) + 0.4
    f = rng.randint(0, num_vertices, size=(num_faces, 3)).astype(np.int32)
    colors = rng.uniform(size=(num_vertices, c)).astype(np.float32)
    bg = rng.uniform(size=(h, w, c)).astype(np.float32)
    return bg, v, colors, f


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_oracle_matches_reference_backend(seed):
    bg, v, colors, f = _random_scene(seed)
    expected_pixels, expected_index = oracle.rasterise(bg, v, colors, f)
    pixels, aux = dispatch.forward_batch(
        jnp.asarray(bg)[None], jnp.asarray(v)[None],
        jnp.asarray(colors)[None], jnp.asarray(f)[None],
        backend="reference")
    np.testing.assert_array_equal(np.asarray(aux.face_index[0]),
                                  expected_index)
    np.testing.assert_array_equal(np.asarray(pixels[0]), expected_pixels)


def test_oracle_matches_pallas_backend():
    bg, v, colors, f = _random_scene(7)
    expected_pixels, expected_index = oracle.rasterise(bg, v, colors, f)
    pixels, aux = dispatch.forward_batch(
        jnp.asarray(bg)[None], jnp.asarray(v)[None],
        jnp.asarray(colors)[None], jnp.asarray(f)[None],
        backend="pallas")
    np.testing.assert_array_equal(np.asarray(aux.face_index[0]),
                                  expected_index)
    # Interpolated values: the fused kernel's FMA contraction may differ from
    # the strictly-rounded oracle by cancellation-amplified rounding at edges.
    np.testing.assert_allclose(np.asarray(pixels[0]), expected_pixels,
                               atol=1e-4, rtol=1e-5)


def test_oracle_square_test_exact():
    verts = np.array([[0, 0], [0, 1], [1, 1], [1, 0]], np.float32) * 16 - 8
    verts += [32, 64]
    verts = verts * 2. / [128, 128] - 1.
    verts = np.concatenate(
        [verts, np.zeros([4, 1], np.float32), np.ones([4, 1], np.float32)], 1)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    pixels, _ = oracle.rasterise(
        np.zeros((128, 128, 1), np.float32), verts,
        np.ones((4, 1), np.float32), faces)
    xs, ys = np.meshgrid(np.arange(128), np.arange(128))
    expected = ((np.abs(xs + 0.5 - 32) <= 8)
                & (np.abs(ys + 0.5 - 64) <= 8)).astype(np.float32)
    np.testing.assert_array_equal(pixels[:, :, 0], expected)


def test_oracle_occlusion_scene():
    verts, faces, front, back = meshes.two_squares(
        front_depth=0.0, back_depth=0.5, size=0.8, back_size=0.9)
    colors = np.zeros((8, 3), np.float32)
    colors[front] = [1., 0., 0.]
    colors[back] = [0., 1., 0.]
    bg = np.zeros((32, 32, 3), np.float32)
    expected_pixels, _ = oracle.rasterise(bg, verts, colors, faces)
    got = np.asarray(dirt_tpu.rasterise(
        jnp.asarray(bg), jnp.asarray(verts), jnp.asarray(colors),
        jnp.asarray(faces), backend="reference"))
    # Interior must be solid red in both.
    assert (expected_pixels[12:20, 12:20, 0] == 1).all()
    np.testing.assert_array_equal(got, expected_pixels)


def test_visibility_f64_agrees_on_well_conditioned_scenes():
    # The double-precision adjudicator (near-tie winner arbitration for the
    # sub-pixel-face regime) must agree with the f32 oracle and the
    # reference backend everywhere the winner pick is well-conditioned --
    # i.e. on ordinary random scenes, where f32 rounding never flips a
    # depth comparison.
    bg, verts, colors, faces = _random_scene(23)
    _, idx_f32 = oracle.rasterise(bg, verts, colors, faces)
    idx_f64 = oracle.visibility_f64(verts, faces, bg.shape[0], bg.shape[1])
    np.testing.assert_array_equal(idx_f32, idx_f64)
    _, aux = dispatch.forward_batch(
        bg[None], verts[None], colors[None], faces[None], backend="reference")
    np.testing.assert_array_equal(np.asarray(aux.face_index[0]), idx_f64)
