"""Round-trip tests for dirt_tpu.projection."""

import numpy as np
import jax.numpy as jnp

from dirt_tpu import matrices, projection


def _camera_matrices():
    view = matrices.compose(
        matrices.translation(jnp.array([0.2, -1.5, -3.5])),
        matrices.rodrigues(jnp.array([-0.3, 0.1, 0.])),
    )
    proj = matrices.perspective_projection(
        near=0.1, far=20., right=0.1, aspect=0.75)
    return view, proj


def test_unproject_rays_hit_projected_points():
    # Project world points to pixels, then unproject those pixels; the ray
    # must pass (approximately) through the original world points.
    view, proj = _camera_matrices()
    world_to_clip = matrices.compose(view, proj)
    clip_to_world = jnp.linalg.inv(world_to_clip)

    width, height = 64, 48
    rng = np.random.RandomState(1)
    points_world = rng.uniform(-0.8, 0.8, size=(20, 3)).astype(np.float32)
    homog = jnp.concatenate(
        [jnp.asarray(points_world), jnp.ones((20, 1))], axis=1)
    clip = homog @ world_to_clip
    ndc = clip[:, :3] / clip[:, 3:]
    # Invert the pixel->NDC map of projection._pixel_to_ndc.
    px = (ndc[:, 0] + 1.) * width / 2.
    py = (-ndc[:, 1] + 1.) * height / 2.
    pixels = jnp.stack([px, py], axis=1)

    starts, deltas = projection.unproject_pixels_to_rays(
        pixels, clip_to_world, jnp.array([width, height], jnp.int32))

    # Distance of each world point to its ray.
    starts = np.asarray(starts)
    dirs = np.asarray(deltas)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rel = points_world - starts
    closest = starts + dirs * np.sum(rel * dirs, axis=-1, keepdims=True)
    dist = np.linalg.norm(points_world - closest, axis=-1)
    assert np.all(dist < 1e-3), dist.max()


def test_ray_starts_on_near_plane_and_deltas_point_away():
    view, proj = _camera_matrices()
    clip_to_world = jnp.linalg.inv(matrices.compose(view, proj))
    pixels = jnp.array([[32., 24.], [10., 40.]])
    starts, deltas = projection.unproject_pixels_to_rays(
        pixels, clip_to_world, jnp.array([64, 48], jnp.int32))
    # Camera position in world space: row of inv(view).
    cam_world = np.asarray(jnp.linalg.inv(view))[3, :3]
    d_start = np.linalg.norm(np.asarray(starts) - cam_world, axis=-1)
    # Ray starts sit on the near plane (distance ~ near = 0.1 from camera,
    # up to obliquity), and deltas point away from the camera.
    assert np.all(d_start > 0.09) and np.all(d_start < 0.2)
    further = np.asarray(starts) + np.asarray(deltas)
    d_further = np.linalg.norm(further - cam_world, axis=-1)
    assert np.all(d_further > d_start)


def test_per_pixel_grid_broadcasting():
    view, proj = _camera_matrices()
    clip_to_world = jnp.linalg.inv(matrices.compose(view, proj))
    grid = jnp.stack(jnp.meshgrid(
        jnp.arange(8., dtype=jnp.float32),
        jnp.arange(6., dtype=jnp.float32), indexing='xy'), axis=-1)  # [6, 8, 2]
    starts, deltas = projection.unproject_pixels_to_rays(
        grid, clip_to_world, jnp.array([8, 6], jnp.int32))
    assert starts.shape == (6, 8, 3)
    assert deltas.shape == (6, 8, 3)
