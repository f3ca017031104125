"""Renderer model-family tests: jittability, differentiability, sanity."""

import numpy as np
import jax
import jax.numpy as jnp

from dirt_tpu import lighting
from dirt_tpu.models import (DeferredPhongRenderer, GouraudRenderer,
                             TexturedRenderer)
from dirt_tpu.utils import meshes

W, H = 64, 48


def _cube():
    v, f = meshes.build_cube()
    v, f = lighting.split_vertices_by_face(jnp.asarray(v), jnp.asarray(f))
    return v, f


def test_gouraud_renderer_jit_and_grad():
    v, f = _cube()
    albedo = jnp.ones((v.shape[0], 3))
    model = GouraudRenderer(width=W, height=H)
    render = jax.jit(lambda rot: model.render(v, f, albedo, rot))
    pixels = render(jnp.asarray([0., 0.5, 0.]))
    assert pixels.shape == (H, W, 3)
    assert float(pixels.max()) > 0.1
    g = jax.grad(lambda rot: jnp.sum(render(rot) ** 2))(jnp.asarray([0., .5, 0.]))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_deferred_phong_renderer_highlights():
    v, f = _cube()
    albedo = jnp.ones((v.shape[0], 3))
    model = DeferredPhongRenderer(width=W, height=H)
    light = jnp.asarray([1., -0.3, -0.5])
    light = light / jnp.linalg.norm(light)
    pixels = model.render(v, f, albedo, jnp.asarray([0., 0.5, 0.]), light)
    pixels = np.asarray(pixels)
    assert pixels.shape == (H, W, 3)
    # Specular highlights saturate some pixels towards white; background blue.
    assert pixels[..., 2].max() >= 0.299  # background visible
    assert pixels[..., 0].max() > 0.5     # red diffuse light visible
    g = jax.grad(lambda l: jnp.sum(model.render(
        v, f, albedo, jnp.asarray([0., 0.5, 0.]), l)))(light)
    assert np.abs(np.asarray(g)).sum() > 1e-3


def test_textured_renderer_texture_grads():
    rng = np.random.RandomState(0)
    v, f = meshes.build_cube()
    uvs = jnp.asarray(rng.uniform(size=(8, 2)).astype(np.float32))
    texture = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    model = TexturedRenderer(width=W, height=H)
    light = jnp.asarray([1., -0.3, -0.5])
    light = light / jnp.linalg.norm(light)

    def loss(tex):
        return jnp.sum(model.render(
            jnp.asarray(v), jnp.asarray(f), uvs, tex,
            jnp.asarray([0.2, 0.7, 0.]), light))

    g = jax.grad(loss)(texture)
    assert float(jnp.abs(g).sum()) > 0.01
