"""Resident VMEM table mode must be a bitwise no-op.

DIRT_TPU_BLOCKS_RESIDENT_MB / DIRT_TPU_GRAD_RESIDENT_MB change only the
transport of the fused-CSR kernels' per-visit block (face-table slice /
plane tile): a per-image VMEM BlockSpec with dynamic in-kernel indexing
instead of a per-visit manual DMA.  The sweep expression tree and visit
order are identical, so outputs must reproduce the DMA schedule
bit-for-bit.  These tests pin that claim so the flags stay safe to
sweep on device (sweeps/_sweep_resident.py).
"""
import numpy as np
import jax
import jax.numpy as jnp

from dirt_tpu.ops import backward, dispatch, forward_blocks, grad_blocks
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


def test_forward_resident_bitwise():
    bg, clip, colors, faces = _scene()
    saved = forward_blocks.RESIDENT_MB
    try:
        forward_blocks.RESIDENT_MB = -1.0
        px0, aux0 = jax.jit(lambda c: dispatch.forward_batch(
            bg, c, colors, faces, backend="blocks"))(clip)
        forward_blocks.RESIDENT_MB = 1000.0
        px1, aux1 = jax.jit(lambda c, m=1: dispatch.forward_batch(
            bg, c, colors, faces, backend="blocks"))(clip)
    finally:
        forward_blocks.RESIDENT_MB = saved
    np.testing.assert_array_equal(np.asarray(px0), np.asarray(px1))
    np.testing.assert_array_equal(np.asarray(aux0.indices),
                                  np.asarray(aux1.indices))
    np.testing.assert_array_equal(np.asarray(aux0.barycentric),
                                  np.asarray(aux1.barycentric))
    np.testing.assert_array_equal(np.asarray(aux0.clip_w),
                                  np.asarray(aux1.clip_w))


def test_grad_resident_bitwise():
    bg, clip, colors, faces = _scene()
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces, backend="blocks"))(clip)
    gp = jnp.asarray(np.random.RandomState(1).randn(
        *np.asarray(px).shape).astype(np.float32))
    saved = grad_blocks.RESIDENT_MB
    try:
        grad_blocks.RESIDENT_MB = -1.0
        g0 = jax.jit(lambda v: backward.rasterise_grad_batch(
            v, faces, px, gp, aux, implementation="blocks"))(clip)
        grad_blocks.RESIDENT_MB = 1000.0
        g1 = jax.jit(lambda v, m=1: backward.rasterise_grad_batch(
            v, faces, px, gp, aux, implementation="blocks"))(clip)
    finally:
        grad_blocks.RESIDENT_MB = saved
    for name in ("grad_background", "grad_vertices", "grad_vertex_colors"):
        np.testing.assert_array_equal(np.asarray(getattr(g0, name)),
                                      np.asarray(getattr(g1, name)))
