"""Pallas kernel vs XLA reference backend parity.

Visibility (winning-face maps, vertex-index triples) must match bit-exactly:
random scenes have measure-zero probability of pixel centres exactly on edges
or of exact depth ties.  Interpolated *values* (pixels, barycentrics, clip-w)
may differ by float rounding -- Mosaic and XLA contract FMAs differently, and
edge functions suffer cancellation near edges -- so they are compared with a
tight tolerance instead.  Constant-attribute exactness is covered separately
by the square test.
"""

import numpy as np
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu.ops import dispatch
from dirt_tpu.utils import meshes


def _compare(background, vertices, colors, faces):
    pallas, aux_p = dispatch.forward_batch(
        background, vertices, colors, faces, backend="pallas")
    ref, aux_r = dispatch.forward_batch(
        background, vertices, colors, faces, backend="reference")
    np.testing.assert_array_equal(np.asarray(aux_p.face_index),
                                  np.asarray(aux_r.face_index))
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)
    return np.asarray(pallas)


def test_random_soup_parity():
    rng = np.random.RandomState(0)
    v = rng.randn(1, 60, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 60, size=(1, 40, 3)).astype(np.int32)
    c = rng.uniform(size=(1, 60, 3)).astype(np.float32)
    bg = rng.uniform(size=(1, 48, 96, 3)).astype(np.float32)
    _compare(bg, v, c, f)


def test_batch_parity_with_occlusion():
    vertices, faces, front_ids, back_ids = meshes.two_squares(
        front_depth=0.0, back_depth=0.5, size=0.8, back_size=0.9)
    colors = np.zeros((8, 3), np.float32)
    colors[front_ids] = [1., 0., 0.]
    colors[back_ids] = [0., 1., 0.]
    batch_v = np.stack([vertices, vertices + [0.1, 0., 0., 0.]], axis=0)
    batch = lambda a: np.stack([a, a], axis=0)
    pixels = _compare(
        np.zeros((2, 32, 32, 3), np.float32), batch_v,
        batch(colors), batch(faces))
    assert pixels[..., 0].max() == 1.0  # something rendered


def test_aux_buffers_match():
    rng = np.random.RandomState(4)
    v = rng.randn(1, 30, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 30, size=(1, 20, 3)).astype(np.int32)
    c = rng.uniform(size=(1, 30, 2)).astype(np.float32)
    bg = rng.uniform(size=(1, 40, 64, 2)).astype(np.float32)
    _, aux_p = dispatch.forward_batch(bg, v, c, f, backend="pallas")
    _, aux_r = dispatch.forward_batch(bg, v, c, f, backend="reference")
    np.testing.assert_array_equal(np.asarray(aux_p.face_index),
                                  np.asarray(aux_r.face_index))
    np.testing.assert_array_equal(np.asarray(aux_p.indices),
                                  np.asarray(aux_r.indices))
    np.testing.assert_allclose(np.asarray(aux_p.barycentric),
                               np.asarray(aux_r.barycentric),
                               atol=1e-4, rtol=1e-4)
    finite = np.isfinite(np.asarray(aux_r.clip_w))
    np.testing.assert_array_equal(finite, np.isfinite(np.asarray(aux_p.clip_w)))
    np.testing.assert_allclose(np.asarray(aux_p.clip_w)[finite],
                               np.asarray(aux_r.clip_w)[finite],
                               atol=1e-4, rtol=1e-4)


def test_many_faces_multiple_chunks(monkeypatch):
    # The forward kernel's default CHUNK is 512, so 150 faces would fit one
    # chunk; shrink CHUNK so this scene spans several chunks and the kernel's
    # multi-chunk sweep (c % num_chunks block indexing, hits-prefix loop
    # bounds across chunk boundaries) is exercised hermetically on CPU.
    from dirt_tpu.ops import forward_pallas
    monkeypatch.setattr(forward_pallas, "CHUNK", 64)
    rng = np.random.RandomState(7)
    n = 150
    centres = rng.uniform(-0.9, 0.9, size=(n, 2)).astype(np.float32)
    size = 0.15
    tri = np.stack([
        centres + [0., 0.],
        centres + [size, 0.],
        centres + [0., size],
    ], axis=1)  # [n, 3, 2]
    depth = rng.uniform(-0.5, 0.5, size=(n, 1, 1)).astype(np.float32)
    v = np.concatenate([
        tri, np.broadcast_to(depth, (n, 3, 1)),
        np.ones((n, 3, 1), np.float32)
    ], axis=-1).reshape(1, n * 3, 4)
    f = np.arange(n * 3, dtype=np.int32).reshape(1, n, 3)
    c = rng.uniform(size=(1, n * 3, 3)).astype(np.float32)
    bg = np.zeros((1, 64, 128, 3), np.float32)
    _compare(bg, v, c, f)


def test_blocks_backend_parity(monkeypatch):
    # The block-binned kernel (ops/forward_blocks.py) shares the dense
    # kernel math; shrink its CHUNK so a modest soup spans several blocks
    # and the scalar-prefetch block indexing (per-tile hit lists, repeated
    # tail ids) is exercised hermetically on CPU.
    from dirt_tpu.ops import forward_blocks
    monkeypatch.setattr(forward_blocks, "CHUNK", 16)
    rng = np.random.RandomState(9)
    v = rng.randn(2, 70, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 70, size=(2, 50, 3)).astype(np.int32)
    c = rng.uniform(size=(2, 70, 2)).astype(np.float32)
    bg = rng.uniform(size=(2, 48, 160, 2)).astype(np.float32)
    blocks, aux_b = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    ref, aux_r = dispatch.forward_batch(bg, v, c, f, backend="reference")
    np.testing.assert_array_equal(np.asarray(aux_b.face_index),
                                  np.asarray(aux_r.face_index))
    np.testing.assert_array_equal(np.asarray(aux_b.indices),
                                  np.asarray(aux_r.indices))
    np.testing.assert_allclose(np.asarray(blocks), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_blocks_backend_square_exact(monkeypatch):
    # Constant-attribute exactness through the block-binned path.
    from dirt_tpu.ops import forward_blocks
    monkeypatch.setattr(forward_blocks, "CHUNK", 16)
    size, lo, hi = 64, 16., 48.
    x0, x1 = lo * 2. / size - 1., hi * 2. / size - 1.
    v = np.array([[x0, x0, 0, 1], [x1, x0, 0, 1],
                  [x1, x1, 0, 1], [x0, x1, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    c = np.ones((4, 1), np.float32)
    bg = np.zeros((size, size, 1), np.float32)
    px = dirt_tpu.rasterise(bg, v, c, f, backend="blocks")
    cols = np.arange(size) + 0.5
    inside = (cols >= lo) & (cols < hi)
    want = (inside[None, :] & inside[::-1, None]).astype(np.float32)[..., None]
    np.testing.assert_array_equal(np.asarray(px), want)


def test_blocks_slot_budget_overflow_degrades_safely(monkeypatch):
    # With the slot budget forced tiny, most tiles lose even their
    # mandatory init slot.  The aliased init buffer must make such tiles
    # render BACKGROUND (bounded degradation), never uninitialised values;
    # tiles that did get slots must still match the reference.
    from dirt_tpu.ops import forward_blocks
    monkeypatch.setattr(forward_blocks, "CHUNK", 16)
    monkeypatch.setenv("DIRT_TPU_SLOTS_PER_IMAGE", "2")
    rng = np.random.RandomState(21)
    v = rng.randn(1, 60, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 60, size=(1, 40, 3)).astype(np.int32)
    c = rng.uniform(size=(1, 60, 3)).astype(np.float32)
    bg = rng.uniform(size=(1, 96, 256, 3)).astype(np.float32)
    px_b, aux_b = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    ref, aux_r = dispatch.forward_batch(bg, v, c, f, backend="reference")
    idx_b = np.asarray(aux_b.face_index)
    idx_r = np.asarray(aux_r.face_index)
    # Truncation may drop a tile entirely (background) or drop part of its
    # block list (a face SUBSET renders, so a farther valid face can win).
    # The safety property is bounded degradation, never uninitialised
    # memory: indices stay in [-1, F), pixels stay finite, background
    # pixels are bit-exact background, and agreeing pixels match the
    # reference.
    assert idx_b.min() >= -1 and idx_b.max() < f.shape[1]
    assert np.isfinite(np.asarray(px_b)).all()
    fallback = idx_b == -1
    agree = idx_b == idx_r
    np.testing.assert_allclose(np.asarray(px_b)[fallback],
                               np.asarray(bg)[fallback])
    np.testing.assert_allclose(np.asarray(px_b)[agree],
                               np.asarray(ref)[agree], atol=1e-4)
    # The tiny budget must actually have dropped covered pixels -- i.e.
    # the test exercises the overflow path.
    assert (fallback & (idx_r >= 0)).any()
