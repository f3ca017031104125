"""Shared-edge depth near-ties: pins the segments=2 caveat (PARITY.md).

Discovered in round 3: at the 1x32^2, segments=2 (16-face) bench-scene
config, the JITTED reference backend flips one shared-edge depth tie vs
the native oracle on CPU while the eager path agrees -- a scene-specific
f32 tie (two faces' interpolated depths land bitwise equal at a pixel
centre, and XLA's per-fusion FMA choices decide the comparison), not a
backend bug.  The rule this test enforces: backend disagreements are
CONFINED to near-tie pixels, the segments=2 scene actually has such
pixels (the caveat is real), and the bench/test configs stay at
segments >= 4 where this scene family has none.
"""

import numpy as np
import jax
import jax.numpy as jnp

import bench
from dirt_tpu.ops import dispatch, geometry, reference


def _depth_stack(clip, faces, height, width):
    """[F, H, W] per-face fragment depth (+inf where uncovered)."""
    setup = geometry.face_setup(clip, faces)
    x_ndc, y_ndc = geometry.pixel_centre_ndc(height, width)
    covered, depth = jax.vmap(
        lambda e, z, w, a, v: geometry.fragment_cover_depth(
            e, z, w, a, v, x_ndc[None, :], y_ndc[:, None]))(
        setup.e, setup.z, setup.w, setup.accept, setup.valid)
    return np.where(np.asarray(covered), np.asarray(depth), np.inf)


def _near_tie_mask(depths, rel=1e-5):
    """[H, W] bool: top-two covering faces' depths within `rel`."""
    top2 = np.sort(depths, axis=0)[:2]
    d1, d2 = top2[0], top2[1]
    both = np.isfinite(d1) & np.isfinite(d2)
    return both & ((d2 - d1) <= rel * np.maximum(1.0, np.abs(d1)))


def _winners(bg, clip, colors, faces):
    eager = dispatch.forward_batch(bg, clip, colors, faces, "reference")
    jitted = jax.jit(lambda *a: dispatch.forward_batch(
        *a, "reference"))(bg, clip, colors, faces)
    prod = dispatch.forward_batch(bg, clip, colors, faces)
    return [np.asarray(p[1].face_index[0]) for p in (eager, jitted, prod)]


def test_segments2_scene_has_near_ties_and_disagreements_confined():
    bg, clip, colors, faces, _ = bench.build_scene(1, 32, 2)
    h, w = 32, 32
    depths = _depth_stack(clip[0], faces[0], h, w)
    tie = _near_tie_mask(depths)
    # The caveat is real: this scene has shared-edge near-tie pixels.
    assert tie.any(), "expected near-tie pixels in the segments=2 scene"
    winners = _winners(bg, clip, colors, faces)
    for i in range(len(winners)):
        for j in range(i + 1, len(winners)):
            disagree = winners[i] != winners[j]
            assert not (disagree & ~tie).any(), (
                "backend visibility disagreement outside near-tie pixels")


def test_segments4_scene_is_tie_free_and_exact():
    bg, clip, colors, faces, _ = bench.build_scene(1, 32, 4)
    depths = _depth_stack(clip[0], faces[0], 32, 32)
    assert not _near_tie_mask(depths).any(), (
        "segments=4 scene grew near-tie pixels; bench/test configs rely on "
        "its tie-free geometry")
    winners = _winners(bg, clip, colors, faces)
    for other in winners[1:]:
        np.testing.assert_array_equal(other, winners[0])


def test_bench_default_config_stays_past_the_tie_regime():
    # segments >= 4: the segments=2 cylinder's shared-edge f32 depth ties
    # make single-run winner maps backend/jit-sensitive (see module
    # docstring); the official bench must never time such a scene.
    assert bench.DEFAULT_CONFIG[2] >= 4
