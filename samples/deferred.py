"""Deferred-shading sample: per-pixel Phong lighting from a G-buffer.

TPU-native port of the reference's samples/deferred.py: rasterise a
10-channel G-buffer (mask, world positions, albedo, normals), then shade per
pixel with ambient + diffuse + specular components inside `shader_fn`.
"""

import jax.numpy as jnp

import dirt_tpu
from dirt_tpu import lighting, matrices
from dirt_tpu.utils import meshes
from common import save_ppm

FRAME_WIDTH, FRAME_HEIGHT = 640, 480


def main():
    cube_vertices_object, cube_faces = meshes.build_cube()
    cube_vertices_object, cube_faces = lighting.split_vertices_by_face(
        jnp.asarray(cube_vertices_object), jnp.asarray(cube_faces))
    cube_vertex_colors = jnp.ones_like(cube_vertices_object)

    cube_vertices_object = jnp.concatenate([
        cube_vertices_object,
        jnp.ones_like(cube_vertices_object[:, -1:]),
    ], axis=1)

    cube_vertices_world = cube_vertices_object @ matrices.rodrigues(
        jnp.asarray([0., 0.5, 0.]))
    cube_normals_world = lighting.vertex_normals_pre_split(
        cube_vertices_world, cube_faces)

    view_matrix = matrices.compose(
        matrices.translation(jnp.asarray([0., -1.5, -3.5])),
        matrices.rodrigues(jnp.asarray([-0.3, 0., 0.])))
    projection_matrix = matrices.perspective_projection(
        near=0.1, far=20., right=0.1,
        aspect=float(FRAME_HEIGHT) / FRAME_WIDTH)
    cube_vertices_clip = (
        cube_vertices_world @ view_matrix @ projection_matrix)

    def shader_fn(gbuffer, view_matrix_in, light_direction):
        mask = gbuffer[:, :, :1]
        positions = gbuffer[:, :, 1:4]
        unlit_colors = gbuffer[:, :, 4:7]
        normals = gbuffer[:, :, 7:]

        ambient = unlit_colors * jnp.asarray([0.2, 0.2, 0.2])

        diffuse = lighting.diffuse_directional(
            normals.reshape(-1, 3), unlit_colors.reshape(-1, 3),
            light_direction, light_color=jnp.asarray([1., 0., 0.]),
            double_sided=False,
        ).reshape(FRAME_HEIGHT, FRAME_WIDTH, 3)

        camera_position_world = jnp.linalg.inv(view_matrix_in)[3, :3]
        specular = lighting.specular_directional(
            positions.reshape(-1, 3), normals.reshape(-1, 3),
            unlit_colors.reshape(-1, 3),
            light_direction, light_color=jnp.asarray([1., 1., 1.]),
            camera_position=camera_position_world,
            shininess=jnp.asarray(6.), double_sided=False,
        ).reshape(FRAME_HEIGHT, FRAME_WIDTH, 3)

        background_color = jnp.asarray([0., 0., 0.3])
        return jnp.clip(
            (diffuse + specular + ambient) * mask
            + background_color * (1. - mask), 0., 1.)

    light_direction = jnp.asarray([1., -0.3, -0.5])
    light_direction = light_direction / jnp.linalg.norm(light_direction)

    pixels = dirt_tpu.rasterise_deferred(
        vertices=cube_vertices_clip,
        vertex_attributes=jnp.concatenate([
            jnp.ones_like(cube_vertices_object[:, :1]),   # mask
            cube_vertices_world[:, :3],                   # world positions
            cube_vertex_colors,                           # albedo
            cube_normals_world,                           # normals
        ], axis=1),
        faces=cube_faces,
        background_attributes=jnp.zeros([FRAME_HEIGHT, FRAME_WIDTH, 10]),
        shader_fn=shader_fn,
        shader_additional_inputs=[view_matrix, light_direction])

    save_ppm('deferred.ppm', pixels)


if __name__ == '__main__':
    main()
