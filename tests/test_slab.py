"""Slab-sequential sweep/reduction flags must be bitwise no-ops.

DIRT_TPU_SWEEP_SLAB re-associates the forward chunk sweep's lexicographic
(depth, original index) winner pick -- exactly associative, so any slab
height must reproduce the full-chunk results bit-for-bit (the -0.0
normalisation argument in forward_dense.chunk_candidates requires
S >= 2).  DIRT_TPU_GRAD_SLAB slices the gradient reduction's independent
face rows -- bitwise by construction.  These tests pin both claims so the
flags stay safe to sweep on device.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import backward, dispatch, forward_dense, grad_dense
from dirt_tpu.utils import meshes


def _scene(segments=6):
    rng = np.random.RandomState(0)
    verts, faces = meshes.make_cylinder(0.5, 1.0, 0.1, 0.2, segments)
    verts = np.concatenate(
        [verts, np.ones((verts.shape[0], 1), np.float32)], 1)
    view = np.eye(4, dtype=np.float32)
    view[3, 2] = -3.0
    clip = verts @ view
    clip[:, 2] = 0.5 * clip[:, 2] + 0.5 * clip[:, 3]
    colors = rng.uniform(size=(verts.shape[0], 3)).astype(np.float32)
    bg = rng.uniform(size=(2, 48, 128, 3)).astype(np.float32)
    return (jnp.asarray(bg),
            jnp.asarray(np.stack([clip, clip * np.float32(1.01)])),
            jnp.asarray(np.stack([colors, colors])),
            jnp.asarray(np.stack([faces, faces])))


@pytest.mark.parametrize("slab", [8, 16])
def test_forward_slab_bitwise(slab):
    bg, clip, colors, faces = _scene()
    saved = forward_dense.SLAB
    try:
        forward_dense.SLAB = 0
        px0, aux0 = jax.jit(lambda c: dispatch.forward_batch(
            bg, c, colors, faces, backend="blocks"))(clip)
        forward_dense.SLAB = slab
        px1, aux1 = jax.jit(lambda c, s=slab: dispatch.forward_batch(
            bg, c, colors, faces, backend="blocks"))(clip)
    finally:
        forward_dense.SLAB = saved
    np.testing.assert_array_equal(np.asarray(px0), np.asarray(px1))
    np.testing.assert_array_equal(np.asarray(aux0.indices),
                                  np.asarray(aux1.indices))
    np.testing.assert_array_equal(np.asarray(aux0.barycentric),
                                  np.asarray(aux1.barycentric))
    np.testing.assert_array_equal(np.asarray(aux0.clip_w),
                                  np.asarray(aux1.clip_w))


@pytest.mark.parametrize("slab", [8, 16])
def test_grad_slab_bitwise(slab):
    bg, clip, colors, faces = _scene()
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces, backend="blocks"))(clip)
    gp = jnp.asarray(np.random.RandomState(1).randn(
        *np.asarray(px).shape).astype(np.float32))
    saved = grad_dense.SLAB
    try:
        grad_dense.SLAB = 0
        g0 = jax.jit(lambda v: backward.rasterise_grad_batch(
            v, faces, px, gp, aux, implementation="blocks"))(clip)
        grad_dense.SLAB = slab
        g1 = jax.jit(lambda v, s=slab: backward.rasterise_grad_batch(
            v, faces, px, gp, aux, implementation="blocks"))(clip)
    finally:
        grad_dense.SLAB = saved
    for name in ("grad_background", "grad_vertices", "grad_vertex_colors"):
        np.testing.assert_array_equal(np.asarray(getattr(g0, name)),
                                      np.asarray(getattr(g1, name)))
