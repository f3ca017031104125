"""Silent-cap observability: no geometry may be dropped without a signal.

SURVEY.md section 7 requires binned/capped work schedules to surface
truncation ("padding/capping (silent-cap logging) or a two-pass
count-then-fill design"); the reference *errors* at its only cap
(/root/reference/csrc/rasterise_grad_egl.cpp:399-405).  Our schedules keep
rendering degraded but report the number of unmaterialised face visits as
RasterAux.dropped.  These tests force both truncation points -- the CSR
slot budget (forward_blocks) and the per-tile face cap
(forward_pallas/forward_dense) -- assert the count is non-zero and exact,
and re-run with the budget raised to confirm the result then matches the
reference backend exactly.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dirt_tpu
from dirt_tpu.ops import dispatch

H, W = 64, 256   # 4 tiles at the default 32x128 tiling (dense and blocks)


def full_screen_scene(num_faces):
    """num_faces full-screen triangles at distinct depths, front first.

    Every face's bbox overlaps every tile, which makes the per-tile hit
    count equal to the face count -- the worst case for any capped
    schedule.
    """
    rng = np.random.RandomState(0)
    v = []
    for k in range(num_faces):
        z = -0.9 + 1.8 * k / num_faces     # front-to-back, distinct depths
        v += [[-3., -3., z, 1.], [3., -3., z, 1.], [0., 3., z, 1.]]
    vertices = np.asarray(v, np.float32)
    faces = np.arange(3 * num_faces, dtype=np.int32).reshape(num_faces, 3)
    colors = rng.uniform(size=(3 * num_faces, 3)).astype(np.float32)
    background = rng.uniform(size=(H, W, 3)).astype(np.float32)
    return (jnp.asarray(background)[None], jnp.asarray(vertices)[None],
            jnp.asarray(colors)[None], jnp.asarray(faces)[None])


@pytest.mark.parametrize("fused", [False, True])
def test_blocks_slot_overflow_is_reported_and_recoverable(monkeypatch, fused):
    from dirt_tpu.ops import forward_blocks
    monkeypatch.setattr(forward_blocks, "FUSED", fused)
    # Pin the slot schedule's partition for both schedules: the dropped
    # arithmetic below assumes 4 tiles x 3 blocks (the fused autos pick
    # finer 4-row tiles / 64-face blocks, which changes both counts).
    monkeypatch.setattr(forward_blocks, "TILE_H", 32)
    monkeypatch.setattr(forward_blocks, "CHUNK", 128)
    bg, v, c, f = full_screen_scene(260)   # 3 blocks of 128 at the default
    # 4 tiles x 3 blocks = 12 required slots; a budget of 6 drops 6 (the
    # slot schedule counts mandatory slots, the fused schedule live visits;
    # on this every-tile-hits scene the two counts coincide).
    monkeypatch.setenv("DIRT_TPU_SLOTS_PER_IMAGE", "6")
    pixels, aux = dirt_tpu.rasterise_batch_with_aux(bg, v, c, f,
                                                    backend="blocks")
    assert int(aux.dropped[0]) == 6
    assert np.isfinite(np.asarray(pixels)).all()

    # Raised budget: exact again, and equal to the reference backend.
    monkeypatch.delenv("DIRT_TPU_SLOTS_PER_IMAGE")
    pixels2, aux2 = dirt_tpu.rasterise_batch_with_aux(bg, v, c, f,
                                                      backend="blocks")
    assert int(aux2.dropped[0]) == 0
    _, aux_ref = dirt_tpu.rasterise_batch_with_aux(bg, v, c, f,
                                                   backend="reference")
    assert int(aux_ref.dropped[0]) == 0
    np.testing.assert_array_equal(np.asarray(aux2.face_index),
                                  np.asarray(aux_ref.face_index))


@pytest.mark.parametrize("backend", ["dense", "pallas"])
def test_tile_face_cap_overflow_is_reported_and_recoverable(
        monkeypatch, backend):
    from dirt_tpu.ops import forward_dense, forward_pallas
    mod = forward_dense if backend == "dense" else forward_pallas
    # Shrink the chunk so a 100-face scene overflows a cap of 1 chunk
    # (the default chunks are 64/512 faces; the packing maths is identical).
    monkeypatch.setattr(mod, "CHUNK", 16)
    bg, v, c, f = full_screen_scene(100)
    # Cap 1 -> one 16-row chunk materialised per tile; each of the 4 tiles
    # overlaps all 100 faces, so 84 are dropped per tile.
    monkeypatch.setenv("DIRT_TPU_TILE_FACE_CAP", "1")
    pixels, aux = dirt_tpu.rasterise_batch_with_aux(bg, v, c, f,
                                                    backend=backend)
    assert int(aux.dropped[0]) == 4 * 84
    assert np.isfinite(np.asarray(pixels)).all()
    # Front-to-back draw order + hits-first packing keeps the earliest
    # (nearest) faces, so the capped winner map happens to stay exact here;
    # the signal, not the image, is what this test pins.

    monkeypatch.delenv("DIRT_TPU_TILE_FACE_CAP")
    pixels2, aux2 = dirt_tpu.rasterise_batch_with_aux(bg, v, c, f,
                                                      backend=backend)
    assert int(aux2.dropped[0]) == 0
    _, aux_ref = dirt_tpu.rasterise_batch_with_aux(bg, v, c, f,
                                                   backend="reference")
    np.testing.assert_array_equal(np.asarray(aux2.face_index),
                                  np.asarray(aux_ref.face_index))


def test_normal_scene_reports_zero_drops_on_all_backends():
    rng = np.random.RandomState(5)
    v = rng.randn(1, 60, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 60, size=(1, 40, 3)).astype(np.int32)
    c = rng.uniform(size=(1, 60, 3)).astype(np.float32)
    bg = rng.uniform(size=(1, 32, 64, 3)).astype(np.float32)
    for backend in ("reference", "pallas", "dense", "blocks"):
        _, aux = dirt_tpu.rasterise_batch_with_aux(bg, v, c, f,
                                                   backend=backend)
        assert aux.dropped.shape == (1,)
        assert int(aux.dropped[0]) == 0, backend
