"""Auto tile-shape selection (round 3 device sweep defaults).

forward_dense.tile_shape picks 16x256 for wide images and 32x128 for
narrow ones; forward_blocks picks 4-row tiles / 64-face blocks under the
fused-CSR schedule (32 rows / 128 faces under the slot schedule);
grad_blocks.tile_h_for picks 8-row tiles under the fused schedule and
16/8 rows (below/above ~1k faces) under the slot schedule.  These tests
pin the selection logic and check that every branch still matches the
reference backend bit-exactly (visibility) / to rounding (values) -- the
tile partition must never change the rendered image.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import dirt_tpu
from dirt_tpu.ops import (backward, dispatch, forward_blocks, forward_dense,
                          grad_blocks)


def _random_scene(seed, num_vertices, num_faces, height, width):
    rng = np.random.RandomState(seed)
    v = rng.randn(1, num_vertices, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, num_vertices, size=(1, num_faces, 3)).astype(np.int32)
    c = rng.uniform(size=(1, num_vertices, 3)).astype(np.float32)
    bg = rng.uniform(size=(1, height, width, 3)).astype(np.float32)
    return bg, v, c, f


def test_tile_shape_selection():
    assert forward_dense.tile_shape(256, 256) == (16, 256)
    assert forward_dense.tile_shape(512, 512) == (16, 256)
    assert forward_dense.tile_shape(64, 128) == (32, 128)
    assert forward_dense.tile_shape(128, 96) == (32, 128)
    # 129..256 wide all pad to one 256-lane tile.
    assert forward_dense.tile_shape(64, 130) == (16, 256)


def test_tile_h_for_faces(monkeypatch):
    monkeypatch.setattr(grad_blocks, "FUSED", True)
    assert grad_blocks.tile_h_for(512) == 8
    assert grad_blocks.tile_h_for(8192) == 8
    monkeypatch.setattr(grad_blocks, "FUSED", False)
    assert grad_blocks.tile_h_for(512) == 16
    assert grad_blocks.tile_h_for(1024) == 16
    assert grad_blocks.tile_h_for(1025) == 8
    assert grad_blocks.tile_h_for(8192) == 8
    monkeypatch.setattr(grad_blocks, "TILE_H", 32)
    assert grad_blocks.tile_h_for(512) == 32


def test_forward_blocks_tile_chunk_autos(monkeypatch):
    monkeypatch.setattr(forward_blocks, "FUSED", True)
    assert forward_blocks.tile_h_for() == 4
    assert forward_blocks.chunk_for() == 64
    monkeypatch.setattr(forward_blocks, "FUSED", False)
    assert forward_blocks.tile_h_for() == 32
    assert forward_blocks.chunk_for() == 128
    monkeypatch.setattr(forward_blocks, "TILE_H", 8)
    monkeypatch.setattr(forward_blocks, "CHUNK", 32)
    assert forward_blocks.tile_h_for() == 8
    assert forward_blocks.chunk_for() == 32


def test_blocks_fused_tile_autos_match_reference():
    """The fused autos (4-row tiles, 64-face blocks) on a ragged image:
    the partition must not change the rendered image."""
    background, vertices, colors, faces = _random_scene(
        seed=13, num_vertices=40, num_faces=30, height=42, width=130)
    ref_px, ref_aux = dispatch.forward_batch(
        background, vertices, colors, faces, "reference")
    px, aux = dispatch.forward_batch(
        background, vertices, colors, faces, "blocks")
    np.testing.assert_array_equal(np.asarray(aux.face_index),
                                  np.asarray(ref_aux.face_index))
    np.testing.assert_allclose(np.asarray(px), np.asarray(ref_px),
                               atol=1e-4, rtol=1e-5)


def test_dense_wide_nonmultiple_width_matches_reference():
    """Width 300 exercises the 256-lane tile with ragged padding."""
    background, vertices, colors, faces = _random_scene(
        seed=7, num_vertices=36, num_faces=24, height=40, width=300)
    ref_px, ref_aux = dispatch.forward_batch(
        background, vertices, colors, faces, "reference")
    px, aux = dispatch.forward_batch(
        background, vertices, colors, faces, "dense")
    np.testing.assert_array_equal(np.asarray(aux.face_index),
                                  np.asarray(ref_aux.face_index))
    np.testing.assert_allclose(np.asarray(px), np.asarray(ref_px),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("tile_h", [8, 16])
def test_grad_blocks_tile_rows_match_xla(tile_h, monkeypatch):
    """Both auto tile-row choices give the same gradients as the XLA
    assembly (the partition must not change any per-face reduction)."""
    monkeypatch.setattr(grad_blocks, "TILE_H", tile_h)
    background, vertices, colors, faces = _random_scene(
        seed=11, num_vertices=48, num_faces=40, height=48, width=64)
    pixels, aux = dispatch.forward_batch(
        background, vertices, colors, faces, "dense")
    grad_pixels = jnp.asarray(
        np.random.RandomState(3).randn(*np.asarray(pixels).shape),
        jnp.float32)
    g_ref = backward.rasterise_grad_batch(
        vertices, faces, pixels, grad_pixels, aux, implementation="xla")
    g_blk = backward.rasterise_grad_batch(
        vertices, faces, pixels, grad_pixels, aux, implementation="blocks")
    for name in ("grad_background", "grad_vertices", "grad_vertex_colors"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_blk, name))
        np.testing.assert_allclose(b, a, atol=2e-4 * max(
            1.0, np.abs(a).max()))
