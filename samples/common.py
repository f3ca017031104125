"""Shared sample utilities: image output and the common cube scene."""

import numpy as np
import jax.numpy as jnp

from dirt_tpu import lighting, matrices
from dirt_tpu.utils import meshes


def save_ppm(path, pixels):
    """Writes [H, W, 3] float pixels in [0, 1] as a binary PPM image.

    Relative paths resolve next to the samples, not the caller's cwd, so
    `python samples/foo.py` refreshes the checked-in images in place."""
    import os
    if not os.path.isabs(path):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), path)
    pixels = np.asarray(pixels)
    data = (np.clip(pixels, 0., 1.) * 255).astype(np.uint8)
    h, w = data.shape[:2]
    with open(path, 'wb') as f:
        f.write(f'P6\n{w} {h}\n255\n'.encode())
        f.write(data.tobytes())
    print(f'wrote {path} ({w}x{h})')


def cube_scene(rotation, frame_width, frame_height,
               camera_translation=(0., -1.5, -3.5), camera_tilt=-0.3):
    """Split-vertex cube under a standard camera.

    Returns (clip_vertices [V,4], faces [F,3], world_vertices [V,4],
    normals_world [V,3], view_matrix [4,4]).
    """
    vertices, faces = meshes.build_cube()
    vertices, faces = lighting.split_vertices_by_face(
        jnp.asarray(vertices), jnp.asarray(faces))
    homogeneous = jnp.concatenate(
        [vertices, jnp.ones_like(vertices[:, :1])], axis=1)

    world = homogeneous @ matrices.rodrigues(jnp.asarray(rotation))
    normals = lighting.vertex_normals_pre_split(world, faces)
    view = matrices.compose(
        matrices.translation(jnp.asarray(camera_translation)),
        matrices.rodrigues(jnp.asarray([camera_tilt, 0., 0.])))
    projection = matrices.perspective_projection(
        near=0.1, far=20., right=0.1,
        aspect=float(frame_height) / frame_width)
    clip = world @ view @ projection
    return clip, faces, world, normals, view
