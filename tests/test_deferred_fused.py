"""Fused deferred backward (round 5) vs the two-call formulation.

backward.rasterise_grad_deferred computes both halves of the deferred
gradient (vertex grads from the shaded pixels, attribute/background grads
from the G-buffer cotangent; dirt/rasterise_ops.py:204-237) in ONE
parts="all"-shaped kernel sweep per paired channel group, by feeding the
colour reductions a separate cotangent (`color_cotangent`).  Every
computed row is the identical expression subtree of the two-call path
(parts="position" + parts="color"), so the results must be BITWISE-equal
-- which these tests pin for every implementation, for channel widths
that exercise the 3+1 group pairing, and end-to-end through
rasterise_batch_deferred under both flag states.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu import rasterise_ops
from dirt_tpu.ops import backward, dispatch


def _scene(rng, batch=2, nv=48, nf=40, h=40, w=64, attrs=3):
    v = rng.randn(batch, nv, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, nv, size=(batch, nf, 3)).astype(np.int32)
    a = rng.uniform(size=(batch, nv, attrs)).astype(np.float32)
    bg = rng.uniform(size=(batch, h, w, attrs)).astype(np.float32)
    return jnp.asarray(v), jnp.asarray(f), jnp.asarray(a), jnp.asarray(bg)


def _two_call(vertices, faces, pixels, grad_pixels, gbuffer, grad_gbuffer,
              aux, implementation):
    # The formulation rasterise_grad_deferred replaces
    # (rasterise_ops._deferred_bwd's DEFERRED_FUSED=0 branch), with the
    # implementation pinned on each grouped call.  (A partial with the
    # keyword pre-bound would be overridden by rasterise_grad_grouped's
    # explicit implementation=None pass-through, so pin via a wrapper
    # that only fills the default.)
    import unittest.mock as mock
    orig = backward.rasterise_grad_batch

    def call(v_, f_, p_, gp_, aux_, parts="all", **kw):
        kw.setdefault("implementation", None)
        if kw["implementation"] is None:
            kw["implementation"] = implementation
        return orig(v_, f_, p_, gp_, aux_, parts=parts, **kw)

    with mock.patch.object(backward, "rasterise_grad_batch", call):
        _, gv, _ = backward.rasterise_grad_grouped(
            vertices, faces, pixels, grad_pixels, aux, parts="position")
        gb, _, ga = backward.rasterise_grad_grouped(
            vertices, faces, gbuffer, grad_gbuffer, aux, parts="color")
    return gb, gv, ga


@pytest.mark.parametrize("impl", ["xla", "dense", "blocks"])
@pytest.mark.parametrize("attrs", [3, 7])
def test_fused_deferred_bitwise_vs_two_call(impl, attrs):
    rng = np.random.RandomState(21)
    v, f, a, bg = _scene(rng, attrs=attrs)
    gbuffer, aux = dispatch.forward_batch(bg, v, a, f, "dense")
    light = jnp.asarray(rng.uniform(0.2, 1.0, size=attrs), jnp.float32)
    shader = lambda gb: jnp.tanh(gb * light)[..., :3]     # shaded C=3
    pixels, shader_vjp = jax.vjp(shader, gbuffer)
    grad_pixels = jnp.asarray(
        rng.randn(*np.asarray(pixels).shape), jnp.float32)
    (grad_gbuffer,) = shader_vjp(grad_pixels)

    ref = _two_call(v, f, pixels, grad_pixels, gbuffer, grad_gbuffer, aux,
                    impl)
    got = backward.rasterise_grad_deferred(
        v, f, pixels, grad_pixels, gbuffer, grad_gbuffer, aux,
        implementation=impl)
    for name, r, g in zip(("background", "vertices", "attributes"),
                          ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=f"{name} ({impl}, C={attrs})")


def test_fused_deferred_two_single_channel_shaded_groups():
    # C_shaded=2 groups as 1+1 (the reference's 3+1 rule, begin+3 > C so
    # each group is one channel): BOTH position calls pair with G-buffer
    # groups of different widths (g0 has 3 channels, g1 has 1), so the
    # fused calls mix per-call Scharr widths and colour widths.
    rng = np.random.RandomState(8)
    v, f, a, bg = _scene(rng, attrs=4)
    gbuffer, aux = dispatch.forward_batch(bg, v, a, f, "dense")
    shader = lambda gb: jnp.stack(
        [jnp.tanh(gb).sum(-1), (gb ** 2).sum(-1)], axis=-1)   # C_shaded=2
    pixels, shader_vjp = jax.vjp(shader, gbuffer)
    assert pixels.shape[-1] == 2
    grad_pixels = jnp.asarray(
        rng.randn(*np.asarray(pixels).shape), jnp.float32)
    (grad_gbuffer,) = shader_vjp(grad_pixels)

    ref = _two_call(v, f, pixels, grad_pixels, gbuffer, grad_gbuffer, aux,
                    "xla")
    got = backward.rasterise_grad_deferred(
        v, f, pixels, grad_pixels, gbuffer, grad_gbuffer, aux,
        implementation="xla")
    for name, r, g in zip(("background", "vertices", "attributes"),
                          ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=name)


def test_fused_deferred_wide_shaded_groups():
    # Shaded pixels wider than one group (C=4 -> groups 3+1): the position
    # half must sum per-group Scharr contributions in the same order as
    # the two-call path; G-buffer wider still (C=7 -> groups 3+3+1) so one
    # call pair fuses, one pairs 1-channel-shaded with 3-channel-colour,
    # and one runs colour-only.
    rng = np.random.RandomState(5)
    v, f, a, bg = _scene(rng, attrs=7)
    gbuffer, aux = dispatch.forward_batch(bg, v, a, f, "dense")
    shader = lambda gb: gb[..., :4] ** 2 + 0.3 * gb[..., 3:]
    pixels, shader_vjp = jax.vjp(shader, gbuffer)
    assert pixels.shape[-1] == 4
    grad_pixels = jnp.asarray(
        rng.randn(*np.asarray(pixels).shape), jnp.float32)
    (grad_gbuffer,) = shader_vjp(grad_pixels)

    ref = _two_call(v, f, pixels, grad_pixels, gbuffer, grad_gbuffer, aux,
                    "xla")
    got = backward.rasterise_grad_deferred(
        v, f, pixels, grad_pixels, gbuffer, grad_gbuffer, aux,
        implementation="xla")
    for name, r, g in zip(("background", "vertices", "attributes"),
                          ref, got):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=name)


def test_mxu_falls_back_to_two_calls():
    rng = np.random.RandomState(9)
    v, f, a, bg = _scene(rng, attrs=3)
    gbuffer, aux = dispatch.forward_batch(bg, v, a, f, "dense")
    grad_gbuffer = jnp.asarray(
        rng.randn(*np.asarray(gbuffer).shape), jnp.float32)
    with pytest.raises(ValueError, match="mxu"):
        backward.rasterise_grad_batch(
            v, f, gbuffer, grad_gbuffer, aux, implementation="mxu",
            color_cotangent=grad_gbuffer)
    # The deferred entry routes mxu through the two-call fallback instead.
    gb, gv, ga = backward.rasterise_grad_deferred(
        v, f, gbuffer, grad_gbuffer, gbuffer, grad_gbuffer, aux,
        implementation="mxu")
    assert gv.shape == v.shape and ga.shape == a.shape


def test_color_cotangent_requires_parts_all():
    rng = np.random.RandomState(2)
    v, f, a, bg = _scene(rng, attrs=3)
    gbuffer, aux = dispatch.forward_batch(bg, v, a, f, "dense")
    cot = jnp.zeros_like(gbuffer)
    with pytest.raises(ValueError, match="parts"):
        backward.rasterise_grad_batch(
            v, f, gbuffer, cot, aux, implementation="xla",
            parts="color", color_cotangent=cot)


def test_end_to_end_flag_states_bitwise(monkeypatch):
    # rasterise_batch_deferred gradients must not depend on the
    # DEFERRED_FUSED flag (the fused path is bitwise-equal by design).
    rng = np.random.RandomState(12)
    v, f, a, bg = _scene(rng, batch=1, attrs=4)
    light = jnp.asarray([0.8, 0.6, 0.4, 0.2])
    shader = lambda gb: jnp.tanh(gb * light)

    def loss(vv, aa):
        return jnp.sum(dirt_tpu.rasterise_batch_deferred(
            bg, vv, aa, f, shader_fn=shader) ** 2)

    grads = {}
    for flag in (True, False):
        monkeypatch.setattr(rasterise_ops, "DEFERRED_FUSED", flag)
        grads[flag] = jax.grad(loss, argnums=(0, 1))(v, a)
    for got, want in zip(grads[True], grads[False]):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
