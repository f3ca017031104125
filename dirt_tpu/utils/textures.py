"""Differentiable texture sampling for deferred shading.

jax.numpy equivalents of the UV/texture helpers the reference's textured
sample defines inline (samples/textured.py:16-61): UV-to-pixel-index mapping
(repeat or clamp addressing) and nearest/bilinear texture sampling, all
differentiable wrt both the texture and the UVs.
"""

import jax.numpy as jnp


def uvs_to_pixel_indices(uvs, texture_shape, mode='repeat'):
    """Maps UV coordinates to (row, col) texture pixel indices.

    Assumes u = 0, v = 0 is at the top-left of the texture image (matching
    samples/textured.py:18 -- note this differs from the OpenGL convention).

    Args:
        uvs: [..., 2] float (u, v) coordinates.
        texture_shape: (height, width) of the texture.
        mode: 'repeat' (wrap) or 'clamp'.

    Returns:
        [..., 2] float (row, col) indices into the texture.
    """
    uvs = jnp.asarray(uvs, jnp.float32)[..., ::-1]  # (u, v) -> (v, u) = (row-ish, col-ish)
    texture_shape = jnp.asarray(texture_shape, jnp.float32)
    if mode == 'repeat':
        return uvs % 1. * texture_shape
    if mode == 'clamp':
        return jnp.clip(uvs, 0., 1.) * texture_shape
    raise NotImplementedError(f"unknown addressing mode {mode!r}")


def sample_texture(texture, indices, mode='bilinear'):
    """Samples a texture at fractional pixel indices.

    Args:
        texture: [height, width, C] float.
        indices: [..., 2] float (row, col) indices.
        mode: 'nearest' or 'bilinear'.

    Returns:
        [..., C] sampled values, differentiable wrt texture and indices
        (bilinear mode).
    """
    texture = jnp.asarray(texture, jnp.float32)
    indices = jnp.asarray(indices, jnp.float32)
    h, w = texture.shape[0], texture.shape[1]

    if mode == 'nearest':
        idx = indices.astype(jnp.int32)
        r = jnp.clip(idx[..., 0], 0, h - 1)
        c = jnp.clip(idx[..., 1], 0, w - 1)
        return texture[r, c]

    if mode == 'bilinear':
        floor_indices = jnp.floor(indices)
        frac = indices - floor_indices
        r0 = jnp.clip(floor_indices[..., 0].astype(jnp.int32), 0, h - 1)
        c0 = jnp.clip(floor_indices[..., 1].astype(jnp.int32), 0, w - 1)
        r1 = jnp.clip(r0 + 1, 0, h - 1)
        c1 = jnp.clip(c0 + 1, 0, w - 1)
        fr = frac[..., :1]
        fc = frac[..., 1:]
        return (texture[r0, c0] * (1. - fc) * (1. - fr)
                + texture[r0, c1] * fc * (1. - fr)
                + texture[r1, c0] * (1. - fc) * fr
                + texture[r1, c1] * fc * fr)

    raise NotImplementedError(f"unknown sampling mode {mode!r}")
