"""Spatial (Morton-order) face re-blocking for the CSR kernels.

Block-granularity binning sweeps a whole CHUNK-face block when any member
face hits a tile, so a draw-order-incoherent mesh degrades towards brute
force (forward_blocks.py module docstring).  DIRT_TPU_SPATIAL_SORT permutes
the face table by bbox-centre Morton code before blocking, which restores
spatial coherence for any draw order.  These tests pin the two contracts:

  * exactness: the forward output is BITWISE identical with sorting on or
    off (the winner pick is an order-independent lexicographic minimum and
    table rows carry their original indices), and gradients match the XLA
    path to summation-order tolerance;
  * effectiveness: on a scattered-draw-order scene the sorted hit matrix
    has strictly fewer (tile, block) visits.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import backward, dispatch, forward_blocks, forward_pallas
from dirt_tpu.ops import grad_blocks


def scattered_scene(num_faces=256, height=64, width=128, channels=3,
                    seed=0, permute=True):
    """Small right triangles scattered over the image, in a random draw
    order (spatially incoherent face indexing)."""
    rng = np.random.RandomState(seed)
    grid = int(np.ceil(np.sqrt(num_faces)))
    cx = (np.arange(num_faces) % grid + 0.5) / grid * 2.0 - 1.0
    cy = (np.arange(num_faces) // grid + 0.5) / grid * 2.0 - 1.0
    size = 0.8 / grid
    v0 = np.stack([cx - size, cy - size], axis=1)
    v1 = np.stack([cx + size, cy - size], axis=1)
    v2 = np.stack([cx - size, cy + size], axis=1)
    xy = np.stack([v0, v1, v2], axis=1).reshape(-1, 2)     # [3F, 2]
    z = rng.uniform(-0.5, 0.5, size=(xy.shape[0], 1)).astype(np.float32)
    w = np.ones_like(z)
    vertices = np.concatenate([xy.astype(np.float32), z, w], axis=1)
    faces = np.arange(num_faces * 3, dtype=np.int32).reshape(-1, 3)
    if permute:
        faces = faces[rng.permutation(num_faces)]
    colors = rng.uniform(size=(vertices.shape[0], channels)).astype(
        np.float32)
    background = rng.uniform(size=(height, width, channels)).astype(
        np.float32)
    return (jnp.asarray(background)[None], jnp.asarray(vertices)[None],
            jnp.asarray(colors)[None], jnp.asarray(faces)[None])


def test_forward_bitwise_invariant_under_spatial_sort(monkeypatch):
    bg, v, c, f = scattered_scene()
    base_px, base_aux = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    monkeypatch.setattr(forward_blocks, "SPATIAL", True)
    sort_px, sort_aux = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    assert (np.asarray(sort_aux.face_index)
            == np.asarray(base_aux.face_index)).all()
    assert (np.asarray(sort_px) == np.asarray(base_px)).all()
    np.testing.assert_array_equal(np.asarray(sort_aux.barycentric),
                                  np.asarray(base_aux.barycentric))
    np.testing.assert_array_equal(np.asarray(sort_aux.clip_w),
                                  np.asarray(base_aux.clip_w))


def test_forward_matches_reference_with_spatial_sort(monkeypatch):
    bg, v, c, f = scattered_scene(seed=3)
    monkeypatch.setattr(forward_blocks, "SPATIAL", True)
    blocks_px, blocks_aux = dispatch.forward_batch(
        bg, v, c, f, backend="blocks")
    ref_px, ref_aux = dispatch.forward_batch(bg, v, c, f, backend="reference")
    assert (np.asarray(blocks_aux.face_index)
            == np.asarray(ref_aux.face_index)).all()
    np.testing.assert_allclose(np.asarray(blocks_px), np.asarray(ref_px),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_xla_with_spatial_sort(monkeypatch):
    bg, v, c, f = scattered_scene(num_faces=192, seed=7)
    px, aux = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    rng = np.random.RandomState(11)
    gp = jnp.asarray(rng.uniform(size=px.shape).astype(np.float32))
    want = backward.rasterise_grad_batch(v, f, px, gp, aux,
                                         implementation="xla")
    monkeypatch.setattr(forward_blocks, "SPATIAL", True)
    got = grad_blocks.rasterise_grad_batch(v, f, px, gp, aux)
    np.testing.assert_allclose(np.asarray(got.grad_vertices),
                               np.asarray(want.grad_vertices),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got.grad_vertex_colors),
                               np.asarray(want.grad_vertex_colors),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got.grad_background),
                                  np.asarray(want.grad_background))


@pytest.mark.parametrize("chunk,tile_h", [(64, 4), (32, 8)])
def test_spatial_sort_reduces_block_visits(chunk, tile_h):
    bg, v, c, f = scattered_scene()
    height, width = bg.shape[1:3]
    num_faces = f.shape[1]
    num_blocks = -(-num_faces // chunk)
    tiles_y, tiles_x = -(-height // tile_h), -(-width // 128)

    face_data = forward_pallas._face_table(
        v[0], c[0], f[0], height, width, num_blocks * chunk - num_faces)
    hit_raw = forward_blocks.hit_matrix(
        face_data, (20, 21, 22, 23), num_blocks, chunk,
        tiles_y, tiles_x, tile_h, 128)
    order = forward_blocks.spatial_order(
        face_data, (20, 21, 22, 23), tile_h, 128)
    hit_sorted = forward_blocks.hit_matrix(
        jnp.take(face_data, order, axis=0), (20, 21, 22, 23),
        num_blocks, chunk, tiles_y, tiles_x, tile_h, 128)
    raw, srt = int(jnp.sum(hit_raw)), int(jnp.sum(hit_sorted))
    # The scattered draw order makes nearly every block hit nearly every
    # tile; Morton re-blocking must cut the visit count substantially.
    assert srt < raw / 2, (raw, srt)


def test_spatial_order_is_a_permutation_with_padding_last():
    bg, v, c, f = scattered_scene(num_faces=100)  # pads to 128 at c64
    height, width = bg.shape[1:3]
    face_data = forward_pallas._face_table(v[0], c[0], f[0], height, width,
                                           28)
    order = np.asarray(forward_blocks.spatial_order(
        face_data, (20, 21, 22, 23), 4, 128))
    assert sorted(order.tolist()) == list(range(128))
    # The 28 padded rows (empty bboxes) must sort after every real face.
    assert set(order[-28:].tolist()) == set(range(100, 128))
