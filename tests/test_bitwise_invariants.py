"""CPU regression pins for the round-4 bitwise equivalences.

Two production-default features were proven bit-exact against their
reference forms in one-off device sweeps (sweeps/_sweep_cover.py,
sweeps/_sweep_resident.py, BASELINE.md round-4 sections); this file makes
the equivalences break the CPU suite if a future edit violates either
tree, exactly like test_fused_csr pins the fused-vs-slot schedule:

  * COVER_FAST (forward_dense.chunk_candidates): the reduced-op boolean
    coverage algebra (sign-branch fold + distributed magnitude test +
    NaN-poisoned invalid rows) must match the literal
    geometry.fragment_cover_depth tree bit-for-bit -- pixels, winner maps
    and dropped counts -- on both Pallas backends that evaluate coverage.
  * Resident gradient plane transport (grad_blocks): the per-image VMEM
    plane-stack BlockSpec must produce bit-identical gradients to the
    per-visit manual-DMA schedule (same visits, same accumulation order).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import backward, dispatch, forward_blocks, forward_dense
from dirt_tpu.ops import grad_blocks


def _scene(seed, nv, nf, h, w, batch=2):
    """Random soup plus coverage-algebra stress rows: a degenerate face
    (repeated vertex -> NaN-poisoned pack row), an axis-aligned non-dyadic
    shared-edge pair (exact-zero edge values at pixel centres), and a
    behind-camera face (w <= 0 sign branch)."""
    rng = np.random.RandomState(seed)
    v = rng.randn(batch, nv, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    # Axis-aligned non-dyadic square split along its diagonal (vertices
    # 0-3): ties on the shared edge must rasterise exactly once.
    v[:, 0, :] = [-0.45, -0.45, 0.0, 1.0]
    v[:, 1, :] = [-0.45, 0.4, 0.0, 1.0]
    v[:, 2, :] = [0.4, 0.4, 0.0, 1.0]
    v[:, 3, :] = [0.4, -0.45, 0.0, 1.0]
    # A behind-camera vertex: exercises the negative-w sign branch.
    v[:, 4, :] = [0.2, 0.1, 0.1, -0.7]
    f = rng.randint(0, nv, size=(batch, nf, 3)).astype(np.int32)
    f[:, 0] = [0, 1, 2]
    f[:, 1] = [0, 2, 3]
    f[:, 2] = [4, 5, 6]
    f[:, 3] = [7, 7, 8]     # degenerate: repeated vertex
    c = rng.uniform(size=(batch, nv, 3)).astype(np.float32)
    bg = rng.uniform(size=(batch, h, w, 3)).astype(np.float32)
    return bg, v, c, f


@pytest.mark.parametrize("backend", ["dense", "blocks"])
def test_cover_fast_matches_spec_tree_bitwise(monkeypatch, backend):
    bg, v, c, f = _scene(17, 64, 96, 48, 128)
    monkeypatch.setattr(forward_dense, "COVER_FAST", False)
    px_spec, aux_spec = dispatch.forward_batch(bg, v, c, f, backend)
    monkeypatch.setattr(forward_dense, "COVER_FAST", True)
    px_fast, aux_fast = dispatch.forward_batch(bg, v, c, f, backend)
    np.testing.assert_array_equal(np.asarray(px_fast), np.asarray(px_spec))
    np.testing.assert_array_equal(np.asarray(aux_fast.face_index),
                                  np.asarray(aux_spec.face_index))
    np.testing.assert_array_equal(np.asarray(aux_fast.dropped),
                                  np.asarray(aux_spec.dropped))


@pytest.mark.parametrize("nf", [40, 300])
def test_grad_resident_matches_dma_bitwise(monkeypatch, nf):
    bg, v, c, f = _scene(23, max(48, nf // 2), nf, 48, 128)
    pixels, aux = dispatch.forward_batch(bg, v, c, f, "dense")
    gp = jnp.asarray(np.random.RandomState(3).randn(
        *np.asarray(pixels).shape), jnp.float32)
    monkeypatch.setattr(grad_blocks, "RESIDENT_MB", -1.0)   # force DMA
    g_dma = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                          implementation="blocks")
    monkeypatch.setattr(grad_blocks, "RESIDENT_MB", 64.0)   # force resident
    g_res = backward.rasterise_grad_batch(v, f, pixels, gp, aux,
                                          implementation="blocks")
    for name in ("grad_background", "grad_vertices", "grad_vertex_colors"):
        np.testing.assert_array_equal(np.asarray(getattr(g_res, name)),
                                      np.asarray(getattr(g_dma, name)))


def test_forward_resident_matches_dma_bitwise(monkeypatch):
    # The forward fused-CSR kernel has the same resident/DMA fork for its
    # face-table transport (forward_blocks.RESIDENT_MB, default off).
    bg, v, c, f = _scene(29, 64, 96, 48, 128)
    monkeypatch.setattr(forward_blocks, "RESIDENT_MB", -1.0)
    px_dma, aux_dma = dispatch.forward_batch(bg, v, c, f, "blocks")
    monkeypatch.setattr(forward_blocks, "RESIDENT_MB", 64.0)
    px_res, aux_res = dispatch.forward_batch(bg, v, c, f, "blocks")
    np.testing.assert_array_equal(np.asarray(px_res), np.asarray(px_dma))
    np.testing.assert_array_equal(np.asarray(aux_res.face_index),
                                  np.asarray(aux_dma.face_index))
    np.testing.assert_array_equal(np.asarray(aux_res.dropped),
                                  np.asarray(aux_dma.dropped))
