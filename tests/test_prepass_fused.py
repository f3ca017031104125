"""Fused Pallas gradient pre-pass (ops/prepass_fused.py) vs the XLA path.

The fused kernel computes the same Scharr / dilation / viewport-factor
maths as backward.grad_prepass and emits the plane stack in the
tile-major layout grad_blocks builds via moveaxis/pad/transpose.  The
DECISION planes (adopted barycentrics / face ids, pre-dilation planes,
cotangent pass-through) must match exactly -- the dilation adoptions use
the same shifted values and exact float compares.  The MAGNITUDE planes
(ax/ay/Px/Py) may differ by FMA-contraction rounding: backward's vmapped
scharr/dilate compile as units whose contraction choices the kernel
cannot reproduce (measured 9e-6 relative on CPU).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import backward, dispatch, grad_blocks, prepass_fused
from dirt_tpu.utils import meshes


def _scene(batch, h, w, channels, seed=0, num_faces=40):
    rng = np.random.RandomState(seed)
    nv = 60
    v = rng.randn(batch, nv, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, nv, size=(batch, num_faces, 3)).astype(np.int32)
    c = rng.uniform(size=(batch, nv, channels)).astype(np.float32)
    bg = rng.uniform(size=(batch, h, w, channels)).astype(np.float32)
    gp = rng.randn(batch, h, w, channels).astype(np.float32)
    return (jnp.asarray(v), jnp.asarray(f), jnp.asarray(c),
            jnp.asarray(bg), jnp.asarray(gp))


def _xla_planes(pixels, grad_pixels, aux, tile_h, tile_w, np_dma):
    """The plane stack exactly as grad_blocks' XLA fallback builds it."""
    batch, height, width, channels = pixels.shape
    tiles_y, tiles_x = height // tile_h, width // tile_w
    n_planes = 12 + channels
    pre = backward.grad_prepass(pixels, grad_pixels, aux)
    f32 = lambda a: a.astype(jnp.float32)
    planes = jnp.concatenate([
        jnp.stack([pre.ax, pre.ay, pre.px_t, pre.py_t], axis=1),
        jnp.moveaxis(pre.bary_d, -1, 1),
        f32(pre.face_d)[:, None],
        jnp.moveaxis(pre.bary_pre, -1, 1),
        f32(pre.face_pre)[:, None],
        jnp.moveaxis(grad_pixels, -1, 1),
    ], axis=1)
    planes = planes.reshape(batch, n_planes, tiles_y, tile_h, tiles_x, tile_w)
    planes = planes.transpose(0, 2, 4, 1, 3, 5).reshape(
        batch * tiles_y * tiles_x, n_planes, tile_h * tile_w)
    planes = jnp.pad(planes, ((0, 0), (0, np_dma - n_planes), (0, 0)))
    return planes, pre.dilated


def _assert_planes_match(want, got):
    want, got = np.asarray(want), np.asarray(got)
    np.testing.assert_array_equal(want[:, 4:], got[:, 4:],
                                  err_msg="decision/pass-through planes")
    scale = max(np.abs(want[:, :4]).max(), 1.0)
    np.testing.assert_allclose(want[:, :4] / scale, got[:, :4] / scale,
                               atol=1e-5, err_msg="magnitude planes")


@pytest.mark.parametrize("channels", [1, 3])
def test_plane_stack_matches_xla(channels):
    v, f, c, bg, gp = _scene(2, 32, 128, channels, seed=7)
    pixels, aux = dispatch.forward_batch(bg, v, c, f, backend="reference")
    tile_h, tile_w = 8, 128
    np_dma = 16
    want, want_dil = _xla_planes(pixels, gp, aux, tile_h, tile_w, np_dma)
    got, got_dil = prepass_fused.plane_stack(
        pixels, gp, aux, tile_h, tile_w, np_dma, interpret=True)
    np.testing.assert_array_equal(np.asarray(want_dil), np.asarray(got_dil))
    _assert_planes_match(want, got)


def test_occlusion_scene_dilation_matches():
    # two_squares stacks a nearer square over a farther one: the dilation
    # adoptions (nearer different-triangle neighbours) must agree exactly.
    verts, faces, front, back = meshes.two_squares(
        front_depth=0.0, back_depth=0.5, size=0.8, back_size=0.9)
    rng = np.random.RandomState(1)
    v = jnp.asarray(np.stack([verts, verts + [0.03, 0., 0., 0.]]))
    f = jnp.asarray(np.stack([faces, faces]))
    c = jnp.asarray(rng.uniform(size=(2, 8, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(2, 32, 128, 3)).astype(np.float32))
    gp = jnp.asarray(rng.randn(2, 32, 128, 3).astype(np.float32))
    pixels, aux = dispatch.forward_batch(bg, v, c, f, backend="reference")
    want, want_dil = _xla_planes(pixels, gp, aux, 8, 128, 16)
    got, got_dil = prepass_fused.plane_stack(
        pixels, gp, aux, 8, 128, 16, interpret=True)
    assert np.asarray(want_dil).any()   # the scene must actually dilate
    np.testing.assert_array_equal(np.asarray(want_dil), np.asarray(got_dil))
    _assert_planes_match(want, got)


def test_grad_blocks_toggle_agrees(monkeypatch):
    # Full gradient assembly with the fused pre-pass vs the XLA fallback.
    v, f, c, bg, gp = _scene(2, 64, 128, 3, seed=13, num_faces=45)
    pixels, aux = dispatch.forward_batch(bg, v, c, f, backend="reference")
    monkeypatch.setattr(grad_blocks, "PREPASS", True)
    g_fused = grad_blocks.rasterise_grad_batch(v, f, pixels, gp, aux,
                                               interpret=True)
    monkeypatch.setattr(grad_blocks, "PREPASS", False)
    g_xla = grad_blocks.rasterise_grad_batch(v, f, pixels, gp, aux,
                                             interpret=True)
    for name in ("grad_background", "debug"):
        np.testing.assert_array_equal(
            np.asarray(getattr(g_xla, name)),
            np.asarray(getattr(g_fused, name)), err_msg=name)
    for name in ("grad_vertices", "grad_vertex_colors"):
        a = np.asarray(getattr(g_xla, name))
        b = np.asarray(getattr(g_fused, name))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5,
                                   err_msg=name)


def test_unaligned_image_falls_back(monkeypatch):
    # 60x100 is not tileable by 8x128: supported() must refuse and
    # grad_blocks must still produce XLA-parity gradients via the fallback.
    assert not prepass_fused.supported(60, 100, 3, 8, 128, 16)
    v, f, c, bg, gp = _scene(1, 60, 100, 3, seed=3)
    pixels, aux = dispatch.forward_batch(bg, v, c, f, backend="reference")
    g_blk = grad_blocks.rasterise_grad_batch(v, f, pixels, gp, aux,
                                             interpret=True)
    g_ref = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                          implementation="xla")
    for name in ("grad_vertices", "grad_vertex_colors"):
        a = np.asarray(getattr(g_ref, name))
        b = np.asarray(getattr(g_blk, name))
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-6,
                                   err_msg=name)
