"""Jittable renderer pipelines (the reference's sample programs as models).

Each renderer is a frozen configuration (image size, camera) whose `render`
method is a pure function of scene parameters -- ready for `jax.jit`,
`jax.grad` and `shard_map`.  Geometry enters as object-space vertices plus
faces; the pipeline applies object->world->camera->clip transforms, computes
normals, shades (per-vertex or deferred per-pixel) and rasterises.
"""

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp

from .. import lighting, matrices, rasterise_ops
from ..utils import textures as texture_utils


def _homogenise(vertices):
    vertices = jnp.asarray(vertices, jnp.float32)
    if vertices.shape[-1] == 3:
        vertices = jnp.concatenate(
            [vertices, jnp.ones_like(vertices[..., :1])], axis=-1)
    return vertices


@dataclasses.dataclass(frozen=True)
class Camera:
    """Perspective camera with the reference's conventions."""
    translation: Sequence[float] = (0., -1.5, -3.5)
    rotation: Sequence[float] = (-0.3, 0., 0.)
    near: float = 0.1
    far: float = 20.
    right: float = 0.1

    def matrices(self, width, height):
        view = matrices.compose(
            matrices.translation(jnp.asarray(self.translation)),
            matrices.rodrigues(jnp.asarray(self.rotation)))
        projection = matrices.perspective_projection(
            near=self.near, far=self.far, right=self.right,
            aspect=float(height) / width)
        return view, projection


@dataclasses.dataclass(frozen=True)
class GouraudRenderer:
    """Direct per-vertex diffuse lighting (samples/simple.py pipeline)."""
    width: int
    height: int
    camera: Camera = Camera()
    light_direction: Sequence[float] = (1., 0., 0.)
    light_color: Sequence[float] = (1., 1., 1.)
    ambient: float = 0.2
    backend: Optional[str] = None

    def render(self, vertices_obj, faces, albedo, object_rotation,
               background=None):
        """Renders [H, W, C]; differentiable wrt all array arguments."""
        vertices = _homogenise(vertices_obj)
        world = vertices @ matrices.rodrigues(object_rotation)
        normals = lighting.vertex_normals_pre_split(world, faces)
        view, projection = self.camera.matrices(self.width, self.height)
        clip = world @ view @ projection

        lit = lighting.diffuse_directional(
            normals, albedo, jnp.asarray(self.light_direction),
            jnp.asarray(self.light_color)) * (1. - self.ambient) \
            + albedo * self.ambient
        if background is None:
            background = jnp.zeros(
                (self.height, self.width, albedo.shape[-1]), jnp.float32)
        return rasterise_ops.rasterise(
            background, clip, lit, faces, backend=self.backend)


@dataclasses.dataclass(frozen=True)
class DeferredPhongRenderer:
    """Deferred per-pixel ambient+diffuse+specular (samples/deferred.py)."""
    width: int
    height: int
    camera: Camera = Camera()
    diffuse_color: Sequence[float] = (1., 0., 0.)
    specular_color: Sequence[float] = (1., 1., 1.)
    background_color: Sequence[float] = (0., 0., 0.3)
    shininess: float = 6.
    ambient: float = 0.2
    backend: Optional[str] = None

    def render(self, vertices_obj, faces, albedo, object_rotation,
               light_direction):
        vertices = _homogenise(vertices_obj)
        world = vertices @ matrices.rodrigues(object_rotation)
        normals = lighting.vertex_normals_pre_split(world, faces)
        view, projection = self.camera.matrices(self.width, self.height)
        clip = world @ view @ projection

        height, width = self.height, self.width

        def shader_fn(gbuffer, view_matrix, light_dir):
            mask = gbuffer[:, :, :1]
            positions = gbuffer[:, :, 1:4]
            base = gbuffer[:, :, 4:7]
            nrm = gbuffer[:, :, 7:]
            ambient = base * self.ambient
            diffuse = lighting.diffuse_directional(
                nrm.reshape(-1, 3), base.reshape(-1, 3), light_dir,
                jnp.asarray(self.diffuse_color), double_sided=False,
            ).reshape(height, width, 3)
            camera_position = jnp.linalg.inv(view_matrix)[3, :3]
            specular = lighting.specular_directional(
                positions.reshape(-1, 3), nrm.reshape(-1, 3),
                base.reshape(-1, 3), light_dir,
                jnp.asarray(self.specular_color),
                camera_position=camera_position,
                shininess=jnp.asarray(self.shininess), double_sided=False,
            ).reshape(height, width, 3)
            shaded = (diffuse + specular + ambient) * mask
            return jnp.clip(
                shaded + jnp.asarray(self.background_color) * (1. - mask),
                0., 1.)

        attributes = jnp.concatenate([
            jnp.ones_like(world[:, :1]), world[:, :3], albedo, normals,
        ], axis=1)
        return rasterise_ops.rasterise_deferred(
            jnp.zeros((height, width, 10)), clip, attributes, faces,
            shader_fn=shader_fn,
            shader_additional_inputs=[view, light_direction],
            backend=self.backend)


@dataclasses.dataclass(frozen=True)
class TexturedRenderer:
    """Deferred UV-mapped texturing with diffuse light (samples/textured.py)."""
    width: int
    height: int
    camera: Camera = Camera()
    light_color: Sequence[float] = (0.6, 0.6, 0.6)
    background_color: Sequence[float] = (0., 0., 0.3)
    ambient: float = 0.4
    normals_fn: Callable = lighting.vertex_normals
    backend: Optional[str] = None

    def render(self, vertices_obj, faces, uvs, texture, object_rotation,
               light_direction):
        vertices = _homogenise(vertices_obj)
        world = vertices @ matrices.rodrigues(object_rotation)
        normals = self.normals_fn(world[:, :3], faces)
        view, projection = self.camera.matrices(self.width, self.height)
        clip = world @ view @ projection

        height, width = self.height, self.width

        def shader_fn(gbuffer, tex, light_dir):
            mask = gbuffer[:, :, :1]
            uv = gbuffer[:, :, 1:3]
            nrm = gbuffer[:, :, 3:]
            base = texture_utils.sample_texture(
                tex, texture_utils.uvs_to_pixel_indices(
                    uv, jnp.asarray(tex.shape[:2])))
            diffuse = lighting.diffuse_directional(
                nrm.reshape(-1, 3), base.reshape(-1, 3), light_dir,
                jnp.asarray(self.light_color), double_sided=True,
            ).reshape(height, width, 3)
            shaded = (diffuse + base * self.ambient) * mask
            return shaded + jnp.asarray(self.background_color) * (1. - mask)

        attributes = jnp.concatenate([
            jnp.ones_like(world[:, :1]), jnp.asarray(uvs), normals,
        ], axis=1)
        return rasterise_ops.rasterise_deferred(
            jnp.zeros((height, width, 6)), clip, attributes, faces,
            shader_fn=shader_fn,
            shader_additional_inputs=[texture, light_direction],
            backend=self.backend)
