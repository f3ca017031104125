"""Direct (Gouraud) shading sample: a rotating cube under directional light.

TPU-native port of the reference's samples/simple.py pipeline (the canonical
end-to-end model, SURVEY.md section 3.4): object -> world (rodrigues) ->
vertex normals -> camera (compose) -> clip (perspective) -> per-vertex
diffuse -> rasterise.
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

    vertex_colors_lit = lighting.diffuse_directional(
        cube_normals_world, cube_vertex_colors,
        light_direction=jnp.asarray([1., 0., 0.]),
        light_color=jnp.asarray([1., 1., 1.]),
    ) * 0.8 + cube_vertex_colors * 0.2

    pixels = dirt_tpu.rasterise(
        vertices=cube_vertices_clip,
        faces=cube_faces,
        vertex_colors=vertex_colors_lit,
        background=jnp.zeros([FRAME_HEIGHT, FRAME_WIDTH, 3]),
        width=FRAME_WIDTH, height=FRAME_HEIGHT, channels=3)

    save_ppm('simple.ppm', pixels)


if __name__ == '__main__':
    main()
