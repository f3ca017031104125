"""Pixel-to-ray unprojection helpers (TPU-native, jax.numpy).

API parity with the reference ``dirt/projection.py`` (see
/root/reference/dirt/projection.py:22-70).
"""

import jax.numpy as jnp


def _pixel_to_ndc(pixel_locations, image_size):
    # Reference: dirt/projection.py:6-7 (note the y-flip: pixel y runs down,
    # NDC y runs up).
    return (-1. + 2. * pixel_locations / image_size) * jnp.asarray(
        [1., -1.], dtype=jnp.float32)


def _unproject_ndc_to_world(x_ndc, clip_to_world_matrix):
    # x_ndc and result are indexed by *, x/y/z (not homogeneous).  The
    # z-coordinate of the result has no intuitive meaning but is affinely
    # related to the world-space z.  Reference: dirt/projection.py:10-19.
    homogeneous = jnp.concatenate([x_ndc, jnp.ones_like(x_ndc[..., :1])], axis=-1)
    x_world_scaled = jnp.squeeze(
        jnp.matmul(homogeneous[..., None, :], clip_to_world_matrix), axis=-2)
    return x_world_scaled[..., :3] / x_world_scaled[..., 3:]


def unproject_pixels_to_rays(pixel_locations, clip_to_world_matrix, image_size):
    """Computes world-space ray start points and deltas for the given pixels.

    Args:
        pixel_locations: array of shape [A1..An, B1..Bm, 2] of (x, y) pixel
            coordinates, where the Ai are batch dims over which the projection
            parameters vary and the Bi are per-image pixel dims.
        clip_to_world_matrix: array of shape [A1..An, 4, 4]; typically
            inv(world_to_view @ projection).
        image_size: int array of shape [A1..An, 2] giving (width, height).

    Returns:
        (ray_starts_world, ray_deltas_world): each [A1..An, B1..Bm, 3].  Starts
        lie on the near plane (NDC z = -1); deltas point away from the camera
        (towards NDC z = 0).

    Reference: dirt/projection.py:22-70.
    """
    pixel_locations = jnp.asarray(pixel_locations, jnp.float32)
    clip_to_world_matrix = jnp.asarray(clip_to_world_matrix, jnp.float32)
    image_size = jnp.asarray(image_size, jnp.int32)

    per_iib_dims = pixel_locations.ndim - image_size.ndim  # m in the docstring
    image_size = jnp.reshape(
        image_size, image_size.shape[:-1] + (1,) * per_iib_dims + (2,))
    clip_to_world_matrix = jnp.reshape(
        clip_to_world_matrix,
        clip_to_world_matrix.shape[:-2] + (1,) * per_iib_dims + (4, 4))

    pixel_locations_ndc = _pixel_to_ndc(
        pixel_locations, image_size.astype(jnp.float32))
    near = jnp.concatenate(
        [pixel_locations_ndc, -jnp.ones_like(pixel_locations_ndc[..., :1])],
        axis=-1)
    mid = jnp.concatenate(
        [pixel_locations_ndc, jnp.zeros_like(pixel_locations_ndc[..., :1])],
        axis=-1)
    ray_starts_world = _unproject_ndc_to_world(near, clip_to_world_matrix)
    ray_deltas_world = (
        _unproject_ndc_to_world(mid, clip_to_world_matrix) - ray_starts_world)
    return ray_starts_world, ray_deltas_world
