"""Semantics for triangles crossing the camera plane (w <= 0 vertices).

The reference inherits true near-plane polygon clipping from GL hardware
(csrc/rasterise_egl.cpp:362-380); our backends use the per-fragment
homogeneous rule (ops/geometry.py module docstring proves the equivalence in
exact arithmetic).  These tests pin the behaviour:

  * all our backends (reference scan, fused pallas, dense pallas, native
    scalar oracle) agree bit-exactly on camera-crossing scenes;
  * the independently-derived GL-clipping oracle agrees everywhere except a
    one-pixel band at coverage boundaries (finite-precision clipping);
  * gradients through camera-crossing scenes are finite and the gradient
    kernels agree with the XLA path.
"""

import numpy as np
import jax
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu.ops import backward, dispatch, grad_mxu
from dirt_tpu.utils import oracle


def _crossing_scene(batch=1):
    """Triangles that straddle the camera plane: one vertex behind the
    camera (w < 0), plus a fully-visible occluder and a fully-behind face."""
    rng = np.random.RandomState(42)
    v = np.array([
        # Face 0: crosses w = 0 (vertex 2 behind the camera).
        [-0.6, -0.5, 0.2, 1.0],
        [0.7, -0.4, 0.3, 1.2],
        [0.1, 0.9, -0.4, -0.8],
        # Face 1: ordinary visible triangle in front.
        [-0.8, 0.1, 0.0, 1.0],
        [0.2, -0.8, 0.0, 1.0],
        [0.6, 0.6, 0.0, 1.0],
        # Face 2: entirely behind the camera (w < 0 everywhere) -- GL clips
        # it away completely; so must we.
        [-0.5, -0.5, 0.1, -1.0],
        [0.5, -0.5, 0.1, -1.2],
        [0.0, 0.7, 0.1, -0.9],
        # Face 3: crosses w = 0 with TWO vertices behind.
        [0.9, -0.9, 0.5, 1.5],
        [-0.3, 0.2, -0.2, -0.6],
        [0.8, 0.8, -0.3, -1.1],
    ], np.float32)
    f = np.arange(12, dtype=np.int32).reshape(4, 3)
    c = rng.uniform(size=(12, 3)).astype(np.float32)
    bg = rng.uniform(size=(48, 64, 3)).astype(np.float32)
    tile = lambda a: np.broadcast_to(a, (batch,) + a.shape).copy()
    return tile(bg), tile(v), tile(c), tile(f)


def test_backends_agree_bitwise_on_crossing_scene():
    bg, v, c, f = _crossing_scene()
    outs = {}
    for backend in ("reference", "pallas", "dense", "blocks"):
        pixels, aux = dispatch.forward_batch(bg, v, c, f, backend=backend)
        outs[backend] = (np.asarray(pixels), np.asarray(aux.face_index))
    want_px, want_idx = oracle.rasterise(bg[0], v[0], c[0], f[0])
    for backend, (px, idx) in outs.items():
        np.testing.assert_array_equal(idx[0], want_idx, err_msg=backend)
        np.testing.assert_allclose(px[0], want_px, atol=1e-4, rtol=1e-5,
                                   err_msg=backend)
    # Face 2 (entirely behind the camera) must never be rasterised.
    assert not np.any(want_idx == 2)
    # The crossing faces must produce some coverage (the w > 0 parts).
    assert np.any(want_idx == 0)


def test_per_fragment_rule_matches_gl_clipping_oracle():
    bg, v, c, f = _crossing_scene()
    _, ours = dispatch.forward_batch(bg, v, c, f, backend="reference")
    ours = np.asarray(ours.face_index[0])
    _, clipped = oracle.rasterise_clipped(bg[0], v[0], c[0], f[0])

    disagree = ours != clipped
    if disagree.any():
        # Finite-precision clipping may shift coverage by a pixel at region
        # boundaries: every disagreeing pixel must be adjacent (Chebyshev
        # distance 1) to a coverage-map boundary of the clipped oracle.
        pad = np.pad(clipped, 1, mode="edge")
        near_boundary = np.zeros_like(disagree)
        for dr in (-1, 0, 1):
            for dc in (-1, 0, 1):
                shifted = pad[1 + dr:1 + dr + clipped.shape[0],
                              1 + dc:1 + dc + clipped.shape[1]]
                near_boundary |= shifted != clipped
        stray = disagree & ~near_boundary
        assert not stray.any(), (
            f"{int(stray.sum())} disagreements away from region boundaries")
        # And disagreements must be rare (a band, not a region).
        assert disagree.mean() < 0.02, disagree.mean()


def test_gl_clipping_oracle_agrees_on_ordinary_scene():
    # Sanity: on an all-w>0 scene both oracles give identical visibility and
    # near-identical pixels (different interpolation formulations).
    rng = np.random.RandomState(1)
    v = rng.randn(30, 4).astype(np.float32)
    v[:, 3] = np.abs(v[:, 3]) + 0.7
    f = rng.randint(0, 30, size=(20, 3)).astype(np.int32)
    c = rng.uniform(size=(30, 3)).astype(np.float32)
    bg = rng.uniform(size=(40, 64, 3)).astype(np.float32)
    px_a, idx_a = oracle.rasterise(bg, v, c, f)
    px_b, idx_b = oracle.rasterise_clipped(bg, v, c, f)
    disagree = idx_a != idx_b
    # Identical up to fill-rule differences exactly on shared edges.
    assert disagree.mean() < 0.01, disagree.mean()
    same = ~disagree
    np.testing.assert_allclose(px_a[same], px_b[same], atol=2e-3)


def test_gradients_finite_and_kernels_agree_on_crossing_scene():
    bg, v, c, f = _crossing_scene()
    v_j, f_j = jnp.asarray(v), jnp.asarray(f)
    c_j, bg_j = jnp.asarray(c), jnp.asarray(bg)

    def loss(vv, cc, bb):
        pixels = dirt_tpu.rasterise_batch(bb, vv, cc, f_j)
        return jnp.sum(pixels * pixels)

    grads = jax.grad(loss, argnums=(0, 1, 2))(v_j, c_j, bg_j)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()

    pixels, aux = dispatch.forward_batch(bg_j, v_j, c_j, f_j,
                                         backend="reference")
    gp = jnp.asarray(np.random.RandomState(9).randn(*bg.shape)
                     .astype(np.float32))
    g_xla = backward.rasterise_grad_batch(v_j, f_j, pixels, gp, aux,
                                          implementation="xla")
    from dirt_tpu.ops import grad_blocks, grad_dense
    for kernel in (grad_mxu, grad_dense, grad_blocks):
        g_k = kernel.rasterise_grad_batch(v_j, f_j, pixels, gp, aux,
                                          interpret=True)
        for name in ("grad_background", "grad_vertices",
                     "grad_vertex_colors"):
            a = np.asarray(getattr(g_xla, name))
            b = np.asarray(getattr(g_k, name))
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=3e-6,
                err_msg=f"{name} ({kernel.__name__})")
