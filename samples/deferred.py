"""Deferred-shading sample: per-pixel Phong lighting from a G-buffer.

Rasterises a 10-channel G-buffer (mask, world positions, albedo, normals) and
shades per pixel (ambient + diffuse + specular) in `shader_fn`; then
demonstrates that gradients flow through the shader by recovering the light
direction from the shaded image.
"""

import os
import sys

# Runnable as `python samples/deferred.py` from anywhere: put the repo
# root (dirt_tpu) on sys.path next to this script's directory.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu import lighting
from common import cube_scene, save_ppm

WIDTH, HEIGHT = 640, 480


def make_shader(width, height):
    def shader_fn(gbuffer, view_matrix, light_direction):
        mask = gbuffer[:, :, :1]
        positions = gbuffer[:, :, 1:4]
        albedo = gbuffer[:, :, 4:7]
        normals = gbuffer[:, :, 7:]

        ambient = albedo * 0.2
        diffuse = lighting.diffuse_directional(
            normals.reshape(-1, 3), albedo.reshape(-1, 3),
            light_direction, light_color=jnp.asarray([1., 0., 0.]),
            double_sided=False).reshape(height, width, 3)
        camera_position = jnp.linalg.inv(view_matrix)[3, :3]
        specular = lighting.specular_directional(
            positions.reshape(-1, 3), normals.reshape(-1, 3),
            albedo.reshape(-1, 3),
            light_direction, light_color=jnp.asarray([1., 1., 1.]),
            camera_position=camera_position,
            shininess=jnp.asarray(6.), double_sided=False,
        ).reshape(height, width, 3)
        shaded = (diffuse + specular + ambient) * mask
        return jnp.clip(shaded + jnp.asarray([0., 0., 0.3]) * (1. - mask),
                        0., 1.)
    return shader_fn


def render(light_direction, width=WIDTH, height=HEIGHT):
    clip, faces, world, normals, view = cube_scene(
        jnp.asarray([0., 0.5, 0.]), width, height)
    attributes = jnp.concatenate([
        jnp.ones_like(world[:, :1]),   # coverage mask
        world[:, :3],                  # world positions
        jnp.ones_like(normals),        # albedo
        normals,                       # normals
    ], axis=1)
    return dirt_tpu.rasterise_deferred(
        background_attributes=jnp.zeros([height, width, 10]),
        vertices=clip, vertex_attributes=attributes, faces=faces,
        shader_fn=make_shader(width, height),
        shader_additional_inputs=[view, light_direction])


def main():
    unit = lambda v: v / jnp.linalg.norm(v)
    true_light = unit(jnp.asarray([1., -0.3, -0.5]))
    save_ppm('deferred.ppm', render(true_light))

    # Recover the light direction through the deferred shading gradients.
    target = render(true_light, 160, 120)
    loss = jax.jit(jax.value_and_grad(
        lambda l: jnp.mean((render(unit(l), 160, 120) - target) ** 2)))
    light = jnp.asarray([0.3, -0.8, -0.2])
    for step in range(20):
        value, grad = loss(light)
        light = light - 25.0 * grad
        if step % 5 == 0:
            print(f'step {step:2d} loss {float(value):.6f}')
    print('recovered light:', unit(light).tolist())
    print('true light:     ', true_light.tolist())


if __name__ == '__main__':
    main()
