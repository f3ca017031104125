"""Textured deferred-shading sample with texture-recovery inverse rendering.

Rasterises a 6-channel G-buffer (mask, UVs, normals), samples a real
photographic texture (samples/texture.jpg, the public-domain Grace Hopper
portrait -- the TPU repo's stand-in for the reference's samples/cat.jpg)
with bilinear filtering inside the shader, lights it, and then -- the part
the reference's textured sample doesn't show -- recovers an unknown texture
from the rendered image by descending through the UV/texture-sampling
gradients.  Falls back to a procedural stripe texture if the image asset or
PIL is unavailable.
"""

import numpy as np
import os
import sys

# Runnable as `python samples/textured.py` from anywhere: put the repo
# root (dirt_tpu) on sys.path next to this script's directory.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu import lighting, matrices
from dirt_tpu.utils import textures
from common import save_ppm

WIDTH, HEIGHT = 640, 480


def icosahedron_like_prism():
    """A UV-mapped hexagonal prism (distinct geometry from the cube demos)."""
    segments = 6
    angles = np.linspace(0, 2 * np.pi, segments, endpoint=False)
    top = np.stack([np.cos(angles), np.ones(segments), np.sin(angles)], 1)
    bottom = top * [1., -1., 1.]
    vertices, uvs, faces = [], [], []
    for i in range(segments):
        j = (i + 1) % segments
        base = len(vertices)
        u0, u1 = i / segments, (i + 1) / segments
        vertices += [top[i], top[j], bottom[j], bottom[i]]
        uvs += [[u0 * 4, 0.], [u1 * 4, 0.], [u1 * 4, 1.], [u0 * 4, 1.]]
        faces += [[base, base + 1, base + 2], [base, base + 2, base + 3]]
    return (np.asarray(vertices, np.float32), np.asarray(uvs, np.float32),
            np.asarray(faces, np.int32))


def stripes_texture(size=128):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    return np.stack([
        0.5 + 0.5 * np.sin(x * 20),
        0.5 + 0.5 * np.cos(y * 14),
        0.4 + 0.4 * ((np.floor(x * 6) + np.floor(y * 6)) % 2),
    ], axis=-1).astype(np.float32)


def photo_texture(size=128):
    """Real-image texture (reference parity: dirt samples/textured.py
    samples cat.jpg).  Returns the checked-in photo resized to
    [size, size, 3] in [0, 1], or the procedural stripes if unavailable."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        'texture.jpg')
    try:
        from PIL import Image
        with Image.open(path) as im:
            im = im.convert('RGB').resize((size, size), Image.BILINEAR)
            return np.asarray(im, np.float32) / 255.0
    except Exception as exc:                        # pragma: no cover
        print(f'photo texture unavailable ({exc}); using stripes')
        return stripes_texture(size)


def scene_clip_vertices(vertices_obj):
    homogeneous = jnp.concatenate(
        [jnp.asarray(vertices_obj), jnp.ones((len(vertices_obj), 1))], axis=1)
    world = homogeneous @ matrices.rodrigues(jnp.asarray([0.2, 0.7, 0.]))
    view = matrices.compose(
        matrices.translation(jnp.asarray([0., -0.4, -4.0])),
        matrices.rodrigues(jnp.asarray([-0.35, 0., 0.])))
    projection = matrices.perspective_projection(
        near=0.1, far=20., right=0.1, aspect=float(HEIGHT) / WIDTH)
    return world, world @ view @ projection


def render(texture, width=WIDTH, height=HEIGHT):
    vertices_obj, uvs, faces = icosahedron_like_prism()
    world, clip = scene_clip_vertices(vertices_obj)
    normals = lighting.vertex_normals(world[:, :3], jnp.asarray(faces))

    def shader_fn(gbuffer, tex, light_direction):
        mask = gbuffer[:, :, :1]
        uv = gbuffer[:, :, 1:3]
        n = gbuffer[:, :, 3:]
        base = textures.sample_texture(
            tex, textures.uvs_to_pixel_indices(uv, jnp.asarray(tex.shape[:2])))
        lit = lighting.diffuse_directional(
            n.reshape(-1, 3), base.reshape(-1, 3),
            light_direction, light_color=jnp.asarray([0.6, 0.6, 0.6]),
            double_sided=True).reshape(height, width, 3)
        return (lit + base * 0.4) * mask + jnp.asarray([0., 0., 0.3]) * (1. - mask)

    light = jnp.asarray([1., -0.3, -0.5])
    light = light / jnp.linalg.norm(light)
    return dirt_tpu.rasterise_deferred(
        background_attributes=jnp.zeros([height, width, 6]),
        vertices=clip,
        vertex_attributes=jnp.concatenate([
            jnp.ones((len(vertices_obj), 1)), jnp.asarray(uvs), normals,
        ], axis=1),
        faces=jnp.asarray(faces),
        shader_fn=shader_fn,
        shader_additional_inputs=[texture, light])


def main():
    true_texture = jnp.asarray(photo_texture())
    save_ppm('textured.ppm', render(true_texture))

    # Texture recovery: start from grey, descend through the bilinear
    # sampling + UV interpolation gradients.
    target = render(true_texture, 160, 120)
    loss = jax.jit(jax.value_and_grad(
        lambda t: jnp.mean((render(t, 160, 120) - target) ** 2)))
    texture = jnp.full_like(true_texture, 0.5)
    for step in range(15):
        value, grad = loss(texture)
        texture = texture - 2000.0 * grad
        if step % 5 == 0:
            print(f'step {step:2d} loss {float(value):.6f}')
    visible_error = float(jnp.abs(texture - true_texture).mean())
    print(f'mean texel error after fit: {visible_error:.4f}')
    save_ppm('textured_recovered.ppm', render(texture))


if __name__ == '__main__':
    main()
