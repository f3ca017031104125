"""Direct (Gouraud) shading sample, plus a taste of inverse rendering.

Covers the canonical end-to-end pipeline (SURVEY.md section 3.4): object ->
world -> normals -> camera -> clip -> per-vertex diffuse -> rasterise.  After
rendering the image it also runs a short gradient-descent loop recovering the
cube's rotation from the image -- the use case the differentiable gradients
exist for.
"""

import os
import sys

# Runnable as `python samples/simple.py` from anywhere: put the repo
# root (dirt_tpu) on sys.path next to this script's directory.
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu import lighting
from common import cube_scene, save_ppm

WIDTH, HEIGHT = 640, 480
LIGHT_DIRECTION = jnp.asarray([1., 0., 0.])


def render(rotation, width=WIDTH, height=HEIGHT):
    clip, faces, _, normals, _ = cube_scene(rotation, width, height)
    albedo = jnp.ones_like(normals)
    lit = lighting.diffuse_directional(
        normals, albedo, LIGHT_DIRECTION,
        light_color=jnp.asarray([1., 1., 1.])) * 0.8 + albedo * 0.2
    return dirt_tpu.rasterise(
        jnp.zeros([height, width, 3]), clip, lit, faces)


def main():
    save_ppm('simple.ppm', render(jnp.asarray([0., 0.5, 0.])))

    # Inverse rendering: recover the yaw angle from the image (at a smaller
    # resolution to keep the demo quick).
    target_angle = 0.5
    render_angle = lambda a, *s: render(jnp.stack([0. * a, a, 0. * a]), *s)
    target = render_angle(jnp.asarray(target_angle), 160, 120)
    loss = jax.jit(jax.value_and_grad(
        lambda a: jnp.mean((render_angle(a, 160, 120) - target) ** 2)))

    angle = jnp.asarray(0.25)
    for step in range(40):
        value, grad = loss(angle)
        angle = angle - 4.0 * grad
        if step % 5 == 0:
            print(f'step {step:2d} loss {float(value):.6f} '
                  f'angle {float(angle):.4f}')
    print(f'recovered angle {float(angle):.4f}, target {target_angle}')


if __name__ == '__main__':
    main()
