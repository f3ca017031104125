"""Half-plane tile culling in the binning pre-pass (forward_blocks._edge_keep).

The cull may only remove (tile, face) visits where the face covers no
pixel of the tile (forward) or contributes no gradient (backward, whose
support is coverage dilated one pixel).  Removed visits contribute exact
zeros to every accumulation, so outputs with the cull on and off must be
IDENTICAL -- not merely close -- on any scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import backward, dispatch, forward_blocks, grad_tables
from dirt_tpu.utils import meshes


def _diagonal_strips(n=24, width=256):
    """Long thin diagonal triangles: the worst case for bbox binning (the
    bbox is almost entirely empty space), the best case for the cull."""
    rng = np.random.RandomState(2)
    t = np.linspace(-0.9, 0.1, n, dtype=np.float32)
    a = np.stack([t, t, np.zeros_like(t)], axis=-1)                # on y = x
    b = np.stack([t + 0.8, t + 0.82, np.zeros_like(t)], axis=-1)
    c = np.stack([t + 0.02, t, np.zeros_like(t)], axis=-1)
    v = np.concatenate([a, b, c], axis=0)
    v = np.concatenate([v, np.ones((v.shape[0], 1), np.float32)], axis=1)
    f = np.stack([np.arange(n), np.arange(n) + n, np.arange(n) + 2 * n],
                 axis=1).astype(np.int32)
    colors = rng.uniform(size=(v.shape[0], 3)).astype(np.float32)
    bg = rng.uniform(size=(64, width, 3)).astype(np.float32)
    return (jnp.asarray(v)[None], jnp.asarray(f)[None],
            jnp.asarray(colors)[None], jnp.asarray(bg)[None])


def _toggle(monkeypatch, value):
    monkeypatch.setattr(forward_blocks, "EDGE_CULL", value)


def test_cull_reduces_visits(monkeypatch):
    # Per-face hit counts (chunk=1) on a 2-column tile grid: a diagonal
    # face's bbox spans both columns over its whole row range, but the
    # half-plane cull keeps only the column(s) the face actually crosses
    # per row band.
    v, f, c, bg = _diagonal_strips()
    height, width = bg.shape[1:3]
    from dirt_tpu.ops import forward_pallas
    fd = forward_pallas._face_table(v[0], c[0], f[0], height, width, 0)
    kwargs = dict(num_blocks=f.shape[1], chunk=1, tiles_y=height // 8,
                  tiles_x=width // 128, tile_h=8, tile_w=128)
    _toggle(monkeypatch, False)
    hits_off = forward_blocks.hit_matrix(fd, (20, 21, 22, 23), **kwargs)
    _toggle(monkeypatch, True)
    hits_on = forward_blocks.hit_matrix(
        fd, (20, 21, 22, 23), edge_cols=0, height=height, width=width,
        **kwargs)
    n_off = int(np.asarray(hits_off).sum())
    n_on = int(np.asarray(hits_on).sum())
    assert n_on < 0.75 * n_off, (n_on, n_off)   # the cull must fire


@pytest.mark.parametrize("scene", ["strips", "squares", "soup"])
def test_forward_identical_with_cull(monkeypatch, scene):
    if scene == "strips":
        v, f, c, bg = _diagonal_strips()
    elif scene == "squares":
        # Axis-aligned shared-edge geometry at non-dyadic coordinates: the
        # fill-rule stress case (E == 0 pixels must never be culled).
        verts, faces, front, back = meshes.two_squares(
            front_depth=0.0, back_depth=0.5, size=0.45, back_size=0.4)
        rng = np.random.RandomState(3)
        v = jnp.asarray(verts)[None]
        f = jnp.asarray(faces)[None]
        c = jnp.asarray(rng.uniform(size=(1, 8, 3)).astype(np.float32))
        bg = jnp.asarray(rng.uniform(size=(1, 48, 128, 3)).astype(np.float32))
    else:
        rng = np.random.RandomState(7)
        vv = rng.randn(1, 60, 4).astype(np.float32)
        vv[..., 3] = np.abs(vv[..., 3]) + 0.5
        v = jnp.asarray(vv)
        f = jnp.asarray(rng.randint(0, 60, size=(1, 45, 3)).astype(np.int32))
        c = jnp.asarray(rng.uniform(size=(1, 60, 3)).astype(np.float32))
        bg = jnp.asarray(rng.uniform(size=(1, 64, 128, 3)).astype(np.float32))

    _toggle(monkeypatch, False)
    p_off, a_off = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    _toggle(monkeypatch, True)
    p_on, a_on = dispatch.forward_batch(bg, v, c, f, backend="blocks")
    np.testing.assert_array_equal(np.asarray(a_off.face_index),
                                  np.asarray(a_on.face_index))
    np.testing.assert_array_equal(np.asarray(p_off), np.asarray(p_on))
    # Against the unbinned reference backend: visibility is bit-exact;
    # pixels agree to FMA-contraction rounding (the fused kernel shades
    # in-kernel, the reference backend via reference.shade_pixels).
    p_ref, a_ref = dispatch.forward_batch(bg, v, c, f, backend="reference")
    np.testing.assert_array_equal(np.asarray(a_ref.face_index),
                                  np.asarray(a_on.face_index))
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_on),
                               atol=1e-5, rtol=1e-5)


def test_gradients_identical_with_cull(monkeypatch):
    # Occlusion scene: dilation adopts occluder values one pixel outside
    # its coverage, exactly the support the dilated cull rectangle must
    # keep.  Culled visits contribute exact zeros, so gradients match
    # bitwise across the toggle.
    verts, faces, front, back = meshes.two_squares(
        front_depth=0.0, back_depth=0.5, size=0.8, back_size=0.9)
    rng = np.random.RandomState(5)
    v = jnp.asarray(np.stack([verts, verts + [0.04, 0., 0., 0.]]))
    f = jnp.asarray(np.stack([faces, faces]))
    c = jnp.asarray(rng.uniform(size=(2, 8, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(2, 64, 128, 3)).astype(np.float32))
    gp = jnp.asarray(rng.randn(2, 64, 128, 3).astype(np.float32))
    px, aux = dispatch.forward_batch(bg, v, c, f, backend="reference")
    _toggle(monkeypatch, False)
    g_off = backward.rasterise_grad_batch(v, f, px, gp, aux,
                                          implementation="blocks")
    _toggle(monkeypatch, True)
    g_on = backward.rasterise_grad_batch(v, f, px, gp, aux,
                                         implementation="blocks")
    for name in ("grad_background", "grad_vertices", "grad_vertex_colors",
                 "debug"):
        np.testing.assert_array_equal(np.asarray(getattr(g_off, name)),
                                      np.asarray(getattr(g_on, name)),
                                      err_msg=name)
