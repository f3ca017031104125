"""Textured deferred-shading sample: UV-mapped procedural texture on a cube.

TPU-native port of the reference's samples/textured.py: rasterise a 6-channel
G-buffer (mask, UVs, normals), sample a texture with bilinear filtering in
the shader, and add diffuse + ambient lighting.  The reference loads a cat
photo (samples/cat.jpg); to keep this repo dependency-free we synthesise a
checkerboard+gradient texture instead -- gradients flow through texture and
UVs identically.
"""

import numpy as np
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu import lighting, matrices
from dirt_tpu.utils import textures
from common import save_ppm

FRAME_WIDTH, FRAME_HEIGHT = 640, 480


def build_textured_cube():
    vertices, uvs, faces = [], [], []

    def add_quad(quad_vertices, quad_uvs):
        index = len(vertices)
        faces.extend([[index + 2, index + 1, index],
                      [index, index + 3, index + 2]])
        vertices.extend(quad_vertices)
        uvs.extend(quad_uvs)

    add_quad([[-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
             [[0.1, 0.9], [0.9, 0.9], [0.9, 0.1], [0.1, 0.1]])   # front
    add_quad([[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1]],
             [[1, 1], [0, 1], [0, 0], [1, 0]])                   # back
    add_quad([[1, 1, 1], [1, 1, -1], [1, -1, -1], [1, -1, 1]],
             [[0.3, 0.25], [0.6, 0.25], [0.6, 0.55], [0.3, 0.55]])  # right
    add_quad([[-1, 1, 1], [-1, 1, -1], [-1, -1, -1], [-1, -1, 1]],
             [[0.4, 0.4], [0.5, 0.4], [0.5, 0.5], [0.4, 0.5]])   # left
    add_quad([[-1, 1, -1], [1, 1, -1], [1, 1, 1], [-1, 1, 1]],
             [[0, 0], [2, 0], [2, 2], [0, 2]])                   # top
    add_quad([[-1, -1, -1], [1, -1, -1], [1, -1, 1], [-1, -1, 1]],
             [[0, 0], [2, 0], [2, 2], [0, 2]])                   # bottom

    return (np.asarray(vertices, np.float32), np.asarray(uvs, np.float32),
            np.asarray(faces, np.int32))


def procedural_texture(size=256):
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    checker = ((np.floor(x * 8) + np.floor(y * 8)) % 2)
    r = 0.2 + 0.6 * checker
    g = 0.3 + 0.5 * x
    b = 0.3 + 0.5 * y
    return np.stack([r, g, b], axis=-1).astype(np.float32)


def main():
    cube_vertices_object, cube_uvs, cube_faces = build_textured_cube()
    texture = jnp.asarray(procedural_texture())

    cube_vertices_object = jnp.concatenate([
        jnp.asarray(cube_vertices_object),
        jnp.ones((cube_vertices_object.shape[0], 1)),
    ], axis=1)

    cube_vertices_world = cube_vertices_object @ matrices.rodrigues(
        jnp.asarray([0., 0.6, 0.]))
    cube_normals_world = lighting.vertex_normals(
        cube_vertices_world, jnp.asarray(cube_faces))

    view_matrix = matrices.compose(
        matrices.translation(jnp.asarray([0., -2., -3.2])),
        matrices.rodrigues(jnp.asarray([-0.5, 0., 0.])))
    projection_matrix = matrices.perspective_projection(
        near=0.1, far=20., right=0.1,
        aspect=float(FRAME_HEIGHT) / FRAME_WIDTH)
    cube_vertices_clip = (
        cube_vertices_world @ view_matrix @ projection_matrix)

    def shader_fn(gbuffer, texture_in, light_direction):
        mask = gbuffer[:, :, :1]
        uvs = gbuffer[:, :, 1:3]
        normals = gbuffer[:, :, 3:]

        unlit_colors = textures.sample_texture(
            texture_in,
            textures.uvs_to_pixel_indices(
                uvs, jnp.asarray(texture_in.shape[:2])))

        ambient = unlit_colors * jnp.asarray([0.4, 0.4, 0.4])
        diffuse = lighting.diffuse_directional(
            normals.reshape(-1, 3), unlit_colors.reshape(-1, 3),
            light_direction, light_color=jnp.asarray([0.6, 0.6, 0.6]),
            double_sided=True,
        ).reshape(FRAME_HEIGHT, FRAME_WIDTH, 3)

        background_color = jnp.asarray([0., 0., 0.3])
        return (diffuse + ambient) * mask + background_color * (1. - mask)

    light_direction = jnp.asarray([1., -0.3, -0.5])
    light_direction = light_direction / jnp.linalg.norm(light_direction)

    pixels = dirt_tpu.rasterise_deferred(
        vertices=cube_vertices_clip,
        vertex_attributes=jnp.concatenate([
            jnp.ones_like(cube_vertices_object[:, :1]),  # mask
            jnp.asarray(cube_uvs),                        # texture coords
            cube_normals_world,                           # normals
        ], axis=1),
        faces=jnp.asarray(cube_faces),
        background_attributes=jnp.zeros([FRAME_HEIGHT, FRAME_WIDTH, 6]),
        shader_fn=shader_fn,
        shader_additional_inputs=[texture, light_direction])

    save_ppm('textured.ppm', pixels)


if __name__ == '__main__':
    main()
