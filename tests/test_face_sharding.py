"""Face-parallel multi-chip rasterisation vs the single-chip path.

parallel/face_sharding.py shards the FACE axis over a mesh, combines
per-pixel winners with a lexicographic (depth, global face id) pmin over
the axis, and splits the gradient assembly along the kernels' own lines
(position rows face-sharded + psum via the face-masked blocks kernel;
colour/background rows replicated via the pixel-keyed XLA path).  These
tests pin: forward pixels/aux equality with the unsharded render,
gradient agreement (colour/background exact, position to kernel-vs-XLA
tolerance), cross-shard occlusion, and the divisibility contract.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu.ops import backward, dispatch
from dirt_tpu.parallel import face_sharding
from dirt_tpu.utils import meshes


def _soup(rng, nf=48, nv=60, batch=2, h=40, w=64, c=3):
    v = rng.randn(batch, nv, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, nv, size=(batch, nf, 3)).astype(np.int32)
    colors = rng.uniform(size=(batch, nv, c)).astype(np.float32)
    bg = rng.uniform(size=(batch, h, w, c)).astype(np.float32)
    return (jnp.asarray(v), jnp.asarray(f), jnp.asarray(colors),
            jnp.asarray(bg))


def test_forward_matches_unsharded():
    rng = np.random.RandomState(19)
    v, f, c, bg = _soup(rng)
    mesh = face_sharding.make_face_mesh()
    assert mesh.devices.size == 8

    want_px, want_aux = dispatch.forward_batch(bg, v, c, f)
    got_px, got_aux = face_sharding.rasterise_batch_face_sharded_with_aux(
        mesh, bg, v, c, f)

    np.testing.assert_array_equal(np.asarray(want_px), np.asarray(got_px))
    np.testing.assert_array_equal(np.asarray(want_aux.face_index),
                                  np.asarray(got_aux.face_index))
    np.testing.assert_array_equal(np.asarray(want_aux.indices),
                                  np.asarray(got_aux.indices))
    np.testing.assert_array_equal(np.asarray(want_aux.barycentric),
                                  np.asarray(got_aux.barycentric))
    np.testing.assert_array_equal(np.asarray(want_aux.clip_w),
                                  np.asarray(got_aux.clip_w))
    assert int(np.asarray(got_aux.dropped).sum()) == 0
    # The differentiable entry point renders the same image.
    px2 = face_sharding.rasterise_batch_face_sharded(mesh, bg, v, c, f)
    np.testing.assert_array_equal(np.asarray(want_px), np.asarray(px2))


def test_gradients_match_unsharded():
    rng = np.random.RandomState(23)
    v, f, c, bg = _soup(rng)
    w = jnp.asarray(rng.randn(*np.asarray(
        dispatch.forward_batch(bg, v, c, f)[0]).shape).astype(np.float32))
    mesh = face_sharding.make_face_mesh()

    def loss_ref(bgv, vv, cc):
        return jnp.sum(dirt_tpu.rasterise_batch(bgv, vv, cc, f) * w)

    def loss_shard(bgv, vv, cc):
        return jnp.sum(face_sharding.rasterise_batch_face_sharded(
            mesh, bgv, vv, cc, f) * w)

    ref = jax.grad(loss_ref, argnums=(0, 1, 2))(bg, v, c)
    got = jax.grad(loss_shard, argnums=(0, 1, 2))(bg, v, c)

    # The background gradient is the identical covered-mask select of the
    # cotangent -- but the cotangent reaching the sharded custom_vjp
    # crosses shard_map's replicated-output transpose, a psum of 8
    # identical values whose sequential reduction rounds at odd
    # multiples: +-1 ulp on a few percent of elements (measured max
    # 2.4e-7 abs).  Tolerance is that ulp noise, nothing more.
    np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(got[0]),
                               atol=2e-6, rtol=3e-7)
    # Vertex/colour rows additionally carry the established
    # kernel-vs-XLA summation-order tolerance (the sharded backward runs
    # the blocks kernel; the unsharded CPU reference runs XLA --
    # tests/test_blocks_grads_match_xla).
    for r, g in ((ref[1], got[1]), (ref[2], got[2])):
        a, b = np.asarray(r), np.asarray(g)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-5)


def test_cross_shard_occlusion():
    # Front and back squares land on DIFFERENT shards: the combine must
    # pick the front faces, and the backward's occluder dilation (which
    # runs on the combined aux) must route boundary gradients to the
    # occluder exactly as the unsharded path does.
    rng = np.random.RandomState(5)
    verts, faces, front, back = meshes.two_squares(
        front_depth=0.0, back_depth=0.5, size=0.7, back_size=0.95)
    v = jnp.asarray(verts)[None]
    f = jnp.asarray(faces)[None]           # 4 faces: front pair, back pair
    c = jnp.asarray(rng.uniform(size=(1, 8, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(1, 32, 48, 3)).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))
    mesh = face_sharding.make_face_mesh(jax.devices()[:2])

    want_px, want_aux = dispatch.forward_batch(bg, v, c, f)
    got_px, got_aux = face_sharding.rasterise_batch_face_sharded_with_aux(
        mesh, bg, v, c, f)
    np.testing.assert_array_equal(np.asarray(want_px), np.asarray(got_px))
    np.testing.assert_array_equal(np.asarray(want_aux.face_index),
                                  np.asarray(got_aux.face_index))
    # Both shards actually won somewhere (the scene truly spans chips).
    winners = np.unique(np.asarray(got_aux.face_index))
    assert (winners[winners >= 0] < 2).any()
    assert (winners >= 2).any()

    def loss_ref(vv, cc):
        return jnp.sum(dirt_tpu.rasterise_batch(bg, vv, cc, f) * w)

    def loss_shard(vv, cc):
        return jnp.sum(face_sharding.rasterise_batch_face_sharded(
            mesh, bg, vv, cc, f) * w)

    ref = jax.grad(loss_ref, argnums=(0, 1))(v, c)
    got = jax.grad(loss_shard, argnums=(0, 1))(v, c)
    # Tolerances as in test_gradients_match_unsharded (cotangent ulp noise
    # from the shard_map boundary + kernel-vs-XLA summation order).
    for r, g in zip(ref, got):
        a, b = np.asarray(r), np.asarray(g)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=3e-5)


def test_2d_mesh_batch_by_faces():
    # DP x face-parallel composition on a (2 batch, 4 faces) mesh: each
    # batch-shard pair of chips runs an independent 4-way face-parallel
    # render; the result must still be the unsharded image, and gradients
    # must agree within the 1-D tolerances.
    from jax.sharding import Mesh
    rng = np.random.RandomState(29)
    v, f, c, bg = _soup(rng)            # batch 2, 48 faces
    mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4),
                ("batch", face_sharding.FACE_AXIS))

    want_px, _ = dispatch.forward_batch(bg, v, c, f)
    got_px = face_sharding.rasterise_batch_face_sharded(
        mesh, bg, v, c, f, batch_axis="batch")
    np.testing.assert_array_equal(np.asarray(want_px), np.asarray(got_px))

    w = jnp.asarray(rng.randn(*np.asarray(want_px).shape).astype(np.float32))

    def loss_ref(vv):
        return jnp.sum(dirt_tpu.rasterise_batch(bg, vv, c, f) * w)

    def loss_shard(vv):
        return jnp.sum(face_sharding.rasterise_batch_face_sharded(
            mesh, bg, vv, c, f, batch_axis="batch") * w)

    a = np.asarray(jax.grad(loss_ref)(v))
    b = np.asarray(jax.grad(loss_shard)(v))
    scale = max(np.abs(a).max(), 1.0)
    np.testing.assert_allclose(a / scale, b / scale, atol=3e-5)


def test_face_count_divisibility_raises():
    rng = np.random.RandomState(1)
    v, f, c, bg = _soup(rng, nf=45)    # 45 % 8 != 0
    mesh = face_sharding.make_face_mesh()
    with pytest.raises(ValueError, match="divisible"):
        face_sharding.rasterise_batch_face_sharded(mesh, bg, v, c, f)
