"""Forward rasterisation semantics tests (depth, winding, batching, channels)."""

import numpy as np
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu.utils import meshes

H, W = 32, 32


def render(vertices, faces, colors=None, channels=3, backend="reference",
           background=None):
    vertices = jnp.asarray(vertices, jnp.float32)
    if colors is None:
        colors = jnp.ones((vertices.shape[0], channels))
    if background is None:
        background = jnp.zeros((H, W, channels))
    return dirt_tpu.rasterise(
        background, vertices, jnp.asarray(colors, jnp.float32),
        jnp.asarray(faces, jnp.int32), backend=backend)


def test_occlusion_front_square_wins():
    vertices, faces, front_ids, back_ids = meshes.two_squares(
        front_depth=0.0, back_depth=0.5)
    colors = np.zeros((8, 3), np.float32)
    colors[front_ids] = [1., 0., 0.]
    colors[back_ids] = [0., 1., 0.]
    pixels = np.asarray(render(vertices, faces, colors))
    centre = pixels[H // 2, W // 2]
    np.testing.assert_allclose(centre, [1., 0., 0.], atol=1e-6)
    # The back square is bigger, so its border ring is visible (green).
    assert pixels[..., 1].max() == 1.0


def test_draw_order_breaks_depth_ties():
    # Two coincident squares at the same depth: the first face drawn wins,
    # matching GL_LESS against an already-written equal depth.
    vertices, faces, front_ids, back_ids = meshes.two_squares(
        front_depth=0.25, back_depth=0.25, back_size=0.5)
    colors = np.zeros((8, 3), np.float32)
    colors[front_ids] = [1., 0., 0.]
    colors[back_ids] = [0., 1., 0.]
    pixels = np.asarray(render(vertices, faces, colors))
    centre = pixels[H // 2, W // 2]
    np.testing.assert_allclose(centre, [1., 0., 0.], atol=1e-6)


def test_both_windings_render():
    # No backface culling in the reference (GL_CULL_FACE never enabled).
    v = np.array([
        [-0.5, -0.5, 0., 1.],
        [0.5, -0.5, 0., 1.],
        [0., 0.5, 0., 1.],
    ], np.float32)
    ccw = np.asarray(render(v, [[0, 1, 2]]))
    cw = np.asarray(render(v, [[0, 2, 1]]))
    assert ccw.max() == 1.0
    np.testing.assert_array_equal(ccw, cw)


def test_degenerate_face_renders_nothing():
    v = np.array([
        [-0.5, -0.5, 0., 1.],
        [0.5, -0.5, 0., 1.],
        [0.5, -0.5, 0., 1.],   # repeated vertex: zero screen area
    ], np.float32)
    pixels = np.asarray(render(v, [[0, 1, 2]]))
    assert pixels.max() == 0.0


def test_near_plane_clipping_partial_triangle():
    # One vertex behind the near plane (z_ndc < -1 region must be cut away,
    # exactly as polygon clipping would do).
    v = np.array([
        [-0.8, -0.8, 0., 1.],
        [0.8, -0.8, 0., 1.],
        [0., 0.8, -4., 2.],   # z/w = -2 < -1: beyond the near plane
    ], np.float32)
    pixels = np.asarray(render(v, [[0, 1, 2]]))[..., 0]
    # Screen-linear z hits -1 (the near plane) at y_ndc = -0.2, i.e. row ~19:
    # rows below are visible, rows above (still inside the unclipped
    # footprint) are cut away.
    assert pixels[27, W // 2] == 1.0         # near the base: visible
    assert pixels[12, W // 2] == 0.0         # inside footprint but clipped


def test_far_plane_clipping():
    v = np.array([
        [-0.5, -0.5, 0., 1.],
        [0.5, -0.5, 0., 1.],
        [0., 0.5, 3., 1.],    # z_ndc = 3 > 1: beyond the far plane
    ], np.float32)
    pixels = np.asarray(render(v, [[0, 1, 2]]))[..., 0]
    # z_ndc reaches 1 (the far plane) at y_ndc = -1/6, i.e. row ~18.7.
    assert pixels[22, W // 2] == 1.0         # below the far-plane cut
    assert pixels[12, W // 2] == 0.0         # inside footprint, beyond far


def test_perspective_correct_interpolation():
    # A quad receding in depth: with w = (1, 1, 3, 3) the attribute midpoint
    # shifts towards the near vertices relative to screen-linear lerp.
    v = np.array([
        [-0.9, -0.9, 0., 1.],
        [-0.9, 0.9, 0., 1.],
        [2.7, 0.9, 0., 3.],
        [2.7, -0.9, 0., 3.],
    ], np.float32)
    colors = np.array([[0.], [0.], [1.], [1.]], np.float32)
    pixels = np.asarray(render(
        v, [[0, 1, 2], [0, 2, 3]], colors, channels=1))[..., 0]
    row = pixels[H // 2]
    # At the screen-space midpoint of the quad the perspective-correct value
    # is  (0.5/1) / (0.5/1 + 0.5/3) = 0.75 weighting towards the near edge,
    # i.e. attribute = 0.5*(1/3)/( (1/2)*(1+1/3) )... simpler: value < 0.5.
    mid = row[int(W * 0.45)]  # inside the quad, near its screen midpoint
    assert 0.05 < mid < 0.45


def test_multichannel_forward_matches_grouped():
    # Arbitrary channel counts render in one pass; values must equal the
    # per-channel renders (the reference achieves this by splitting into
    # 3+1 groups, dirt/rasterise_ops.py:86-108).
    rng = np.random.RandomState(0)
    vertices, faces = meshes.build_cube()
    vertices = np.concatenate(
        [vertices * 0.3, np.ones((8, 1), np.float32)], axis=1)
    vertices[:, 2] -= 0.5
    colors = rng.uniform(size=(8, 5)).astype(np.float32)
    background = rng.uniform(size=(H, W, 5)).astype(np.float32)
    full = np.asarray(dirt_tpu.rasterise(
        background, vertices, colors, faces, backend="reference"))
    for c in range(5):
        single = np.asarray(dirt_tpu.rasterise(
            background[..., c:c + 1], vertices, colors[:, c:c + 1], faces,
            backend="reference"))
        np.testing.assert_array_equal(full[..., c:c + 1], single)


def test_batch_matches_stacked_singles():
    rng = np.random.RandomState(3)
    vertices, faces = meshes.build_cube()
    base = np.concatenate(
        [vertices * 0.4, np.ones((8, 1), np.float32)], axis=1)
    batch_v = np.stack([base, base + [0.2, 0.1, 0., 0.]], axis=0)
    batch_c = rng.uniform(size=(2, 8, 3)).astype(np.float32)
    batch_bg = rng.uniform(size=(2, H, W, 3)).astype(np.float32)
    batch_f = np.stack([faces, faces], axis=0)
    batched = np.asarray(dirt_tpu.rasterise_batch(
        batch_bg, batch_v, batch_c, batch_f, backend="reference"))
    for i in range(2):
        single = np.asarray(dirt_tpu.rasterise(
            batch_bg[i], batch_v[i], batch_c[i], faces, backend="reference"))
        np.testing.assert_array_equal(batched[i], single)


def test_shared_diagonal_exactly_once_over_occludee():
    # Pixels whose centres lie exactly on the diagonal shared by a quad's two
    # triangles must be covered by exactly one of them -- never fall through
    # to an occluded surface behind.  Regression test for two numerical
    # failure modes: FMA contraction breaking cross(u,v) == -cross(v,u)
    # antisymmetry in triangle setup, and XLA rematerialising the coverage
    # mask inconsistently inside the depth select.  (Non-dyadic coordinates
    # like 0.4 are essential: they make the edge functions rounding-
    # sensitive.)
    vertices, faces, front_ids, back_ids = meshes.two_squares(
        front_depth=0.0, back_depth=0.5, size=0.8, back_size=0.9)
    colors = np.zeros((8, 3), np.float32)
    colors[front_ids] = [1., 0., 0.]
    colors[back_ids] = [0., 1., 0.]
    pixels = np.asarray(render(vertices, faces, colors))
    interior = pixels[12:20, 12:20]  # strictly inside the front square
    assert (interior[..., 0] == 1.).all(), "pinhole on shared diagonal"
    assert (interior[..., 1] == 0.).all(), "occludee leaked through"


def test_empty_faces_is_background_passthrough():
    background = np.random.RandomState(11).uniform(size=(8, 8, 2)).astype(np.float32)
    pixels = np.asarray(dirt_tpu.rasterise(
        background, jnp.ones([3, 4]), jnp.ones([3, 2]),
        jnp.zeros([0, 3], jnp.int32), backend="reference"))
    np.testing.assert_array_equal(pixels, background)


def test_background_passthrough():
    rng = np.random.RandomState(7)
    background = rng.uniform(size=(H, W, 3)).astype(np.float32)
    v = np.array([[9., 9., 0., 1.]] * 3, np.float32)  # off-screen
    pixels = np.asarray(render(
        v, [[0, 1, 2]], np.ones((3, 3)), background=jnp.asarray(background)))
    np.testing.assert_array_equal(pixels, background)
