"""Fused-CSR schedules (forward_blocks/grad_blocks FUSED=1).

The fused kernels replace the slot-per-grid-step CSR sweep with one grid
step per run (tile for the forward, face block for the gradient) and an
in-kernel fori_loop over the run's live visits, double-buffering the
visited block HBM->VMEM with manual DMA.  The schedule change must be
invisible: identical output bit-for-bit vs the slot kernels (same sweep
expression tree, same accumulation order) and identical dropped counts
under a truncating budget.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu.ops import backward, dispatch, forward_blocks, grad_blocks


def _scene(seed, nv, nf, h, w, batch=2):
    rng = np.random.RandomState(seed)
    v = rng.randn(batch, nv, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, nv, size=(batch, nf, 3)).astype(np.int32)
    c = rng.uniform(size=(batch, nv, 3)).astype(np.float32)
    bg = rng.uniform(size=(batch, h, w, 3)).astype(np.float32)
    return bg, v, c, f


def test_build_runs_matches_hits():
    rng = np.random.RandomState(1)
    hit = jnp.asarray(rng.rand(5, 9) < 0.3)
    starts, counts, ids, dropped = forward_blocks.build_runs(hit, 64)
    hit_n = np.asarray(hit)
    assert int(dropped) == 0
    for r in range(5):
        want = np.nonzero(hit_n[r])[0]
        got = np.asarray(ids)[int(starts[r]):int(starts[r]) + int(counts[r])]
        np.testing.assert_array_equal(got, want)


def test_build_runs_truncation_counts_lost_visits():
    hit = jnp.ones((4, 3), bool)            # 12 visits
    starts, counts, ids, dropped = forward_blocks.build_runs(hit, 7)
    assert int(dropped) == 5
    # First runs keep their visits; the tail is clamped.
    np.testing.assert_array_equal(np.asarray(counts), [3, 3, 1, 0])


@pytest.mark.parametrize("group,depth", [(1, 2), (0, 0)])
@pytest.mark.parametrize("nf", [40, 600])
def test_forward_fused_matches_slot_bitwise(monkeypatch, nf, group, depth):
    # (1, 2) = the ungrouped double-buffered round-3 schedule; (0, 0) =
    # the auto tile-grouped depth-pipelined schedule.  Both must match the
    # slot schedule bit-for-bit (same sweep expression tree per tile).
    bg, v, c, f = _scene(7, max(48, nf // 2), nf, 64, 128)
    monkeypatch.setattr(forward_blocks, "FUSED", False)
    px_s, aux_s = dispatch.forward_batch(bg, v, c, f, "blocks")
    monkeypatch.setattr(forward_blocks, "FUSED", True)
    monkeypatch.setattr(forward_blocks, "GROUP", group)
    monkeypatch.setattr(forward_blocks, "DEPTH", depth)
    px_f, aux_f = dispatch.forward_batch(bg, v, c, f, "blocks")
    np.testing.assert_array_equal(np.asarray(px_f), np.asarray(px_s))
    np.testing.assert_array_equal(np.asarray(aux_f.face_index),
                                  np.asarray(aux_s.face_index))
    np.testing.assert_array_equal(np.asarray(aux_f.dropped),
                                  np.asarray(aux_s.dropped))


@pytest.mark.parametrize("nf", [40, 300])
def test_grad_fused_matches_slot_bitwise(monkeypatch, nf):
    bg, v, c, f = _scene(5, max(48, nf // 2), nf, 48, 128)
    pixels, aux = dispatch.forward_batch(bg, v, c, f, "dense")
    gp = jnp.asarray(np.random.RandomState(3).randn(
        *np.asarray(pixels).shape), jnp.float32)
    # Pin one tile partition for both schedules: bit-exactness across the
    # schedule change holds per partition (same visits, same accumulation
    # order); the schedules' *auto* tile rows differ (8 fused vs 16 slot)
    # and FP summation order is partition-sensitive by design.  Pin the XLA
    # pre-pass too: only the fused schedule can use the fused Pallas
    # pre-pass, whose magnitude planes round differently (test_prepass_fused
    # covers that comparison).
    monkeypatch.setattr(grad_blocks, "TILE_H", 8)
    monkeypatch.setattr(grad_blocks, "PREPASS", False)
    monkeypatch.setattr(grad_blocks, "FUSED", False)
    g_s = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                        implementation="blocks")
    monkeypatch.setattr(grad_blocks, "FUSED", True)
    g_f = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                        implementation="blocks")
    for name in ("grad_background", "grad_vertices", "grad_vertex_colors"):
        np.testing.assert_array_equal(np.asarray(getattr(g_f, name)),
                                      np.asarray(getattr(g_s, name)))


def test_fused_grad_matches_xla():
    bg, v, c, f = _scene(11, 64, 80, 48, 128)
    pixels, aux = dispatch.forward_batch(bg, v, c, f, "dense")
    gp = jnp.asarray(np.random.RandomState(4).randn(
        *np.asarray(pixels).shape), jnp.float32)
    g_x = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                        implementation="xla")
    g_f = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                        implementation="blocks")
    for name in ("grad_background", "grad_vertices", "grad_vertex_colors"):
        a = np.asarray(getattr(g_x, name))
        b = np.asarray(getattr(g_f, name))
        np.testing.assert_allclose(
            b, a, atol=2e-4 * max(1.0, np.abs(a).max()))
