"""Pallas hit-matrix kernel (forward_blocks._hit_kernel) vs the XLA path.

The CSR pack's per-(tile, face) bbox + half-plane test can run as one
Pallas kernel (DIRT_TPU_HIT_PALLAS).  Schedule correctness never depends
on bitwise hit equality (winners are sweep-set independent and unswept
faces reduce zeros), but the kernel mirrors the XLA expression tree, so
in interpret mode the matrices must agree exactly -- which these tests
pin, along with end-to-end blocks-backend equality across flag states.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dirt_tpu.ops import dispatch, forward_blocks, forward_pallas, grad_tables
from dirt_tpu.ops import backward


def _soup(rng, nf, nv=60, batch=2):
    v = rng.randn(batch, nv, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, nv, size=(batch, nf, 3)).astype(np.int32)
    c = rng.uniform(size=(batch, nv, 3)).astype(np.float32)
    return jnp.asarray(v), jnp.asarray(f), jnp.asarray(c)


@pytest.mark.parametrize("edges", [False, True])
@pytest.mark.parametrize("table", ["forward", "grad"])
def test_hit_pallas_matches_xla_bitwise(monkeypatch, table, edges):
    rng = np.random.RandomState(31)
    height = width = 64
    v, f, c = _soup(rng, nf=45)
    chunk, th, tw = 16, 4, 128
    nb = -(-f.shape[1] // chunk)
    pad = nb * chunk - f.shape[1]
    ty, tx = -(-height // th), -(-width // tw)

    def hit(flag):
        monkeypatch.setattr(forward_blocks, "HIT_PALLAS", flag)
        if table == "forward":
            def one(vv, cc, ff):
                fd = forward_pallas._face_table(vv, cc, ff, height, width,
                                                pad)
                return forward_blocks.hit_matrix(
                    fd, (20, 21, 22, 23), nb, chunk, ty, tx, th, tw,
                    edge_cols=0 if edges else None,
                    height=height, width=width)
            return jax.vmap(one)(v, c, f)
        def one(vv, ff):
            fd = grad_tables._grad_face_table(vv, ff, height, width, pad)
            return forward_blocks.hit_matrix(
                fd, (0, 1, 2, 3), nb, chunk, ty, tx, th, tw,
                edge_cols=12 if edges else None,
                height=height, width=width, dilate=1)
        return jax.vmap(one)(v, f)

    h_x, h_p = np.asarray(hit(False)), np.asarray(hit(True))
    assert h_x.sum() > 0                    # scene actually bins something
    np.testing.assert_array_equal(h_x, h_p)


def test_vmem_gate_falls_back_identically(monkeypatch):
    # Past HIT_PALLAS_BYTES the kernel would exceed its scoped-VMEM limit
    # (measured 33.75 MB at 16x256^2x8192f -- ~8 live [T, F] planes), so
    # hit_matrix must take the XLA path; a zero budget forces that branch
    # and the result must match the kernel's exactly.
    rng = np.random.RandomState(41)
    height = width = 64
    v, f, c = _soup(rng, nf=45)
    chunk, th, tw = 16, 4, 128
    nb = -(-f.shape[1] // chunk)
    pad = nb * chunk - f.shape[1]
    ty, tx = -(-height // th), -(-width // tw)

    def hit(budget):
        monkeypatch.setattr(forward_blocks, "HIT_PALLAS", True)
        monkeypatch.setattr(forward_blocks, "HIT_PALLAS_BYTES", budget)

        def one(vv, cc, ff):
            fd = forward_pallas._face_table(vv, cc, ff, height, width, pad)
            return forward_blocks.hit_matrix(
                fd, (20, 21, 22, 23), nb, chunk, ty, tx, th, tw,
                edge_cols=0, height=height, width=width)
        return jax.vmap(one)(v, c, f)

    np.testing.assert_array_equal(np.asarray(hit(0)),
                                  np.asarray(hit(1 << 30)))


def test_build_runs_sortfree_identical(monkeypatch):
    # The cumsum-rank scatter must reproduce the argsort slot list EXACTLY
    # (same values at same positions), including truncated-budget tails.
    rng = np.random.RandomState(3)
    for _ in range(12):
        r, i = rng.randint(2, 30), rng.randint(2, 30)
        hit = jnp.asarray(rng.rand(r, i) < rng.uniform(0.05, 0.9))
        slots = int(rng.randint(1, r * i + 4))
        monkeypatch.setattr(forward_blocks, "RUNS_SORTFREE", False)
        ref = forward_blocks.build_runs(hit, slots)
        monkeypatch.setattr(forward_blocks, "RUNS_SORTFREE", True)
        got = forward_blocks.build_runs(hit, slots)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blocks_backend_identical_across_flag(monkeypatch):
    # End-to-end: forward pixels/aux and gradients through the blocks
    # backend must be identical whichever hit implementation built the
    # schedule (identical hit matrices -> identical CSR -> identical
    # sweeps).
    rng = np.random.RandomState(7)
    v, f, c = _soup(rng, nf=45)
    bg = jnp.asarray(rng.uniform(size=(2, 32, 128, 3)).astype(np.float32))
    gp = jnp.asarray(rng.randn(2, 32, 128, 3).astype(np.float32))

    outs = {}
    for flag in (False, True):
        monkeypatch.setattr(forward_blocks, "HIT_PALLAS", flag)
        px, aux = dispatch.forward_batch(bg, v, c, f, "blocks")
        g = backward.rasterise_grad_batch(v, f, px, gp, aux,
                                          implementation="blocks")
        outs[flag] = (px, aux.face_index, g.grad_vertices,
                      g.grad_vertex_colors)
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
