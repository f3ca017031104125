"""On-TPU test pass: compiled (non-interpret) kernels on the real chip.

The CPU suite under tests/ runs every Pallas kernel in interpreter mode;
this script is the device-side complement (replacing the role of the
reference's device-executed smoke test, /root/reference/Dockerfile:47): one
process, small shapes, persistent compile cache, asserting checks for

  1. square exactness (pallas + dense backends vs the analytic formula),
  2. random-soup visibility parity across all four backends + native oracle,
  3. gradient-kernel parity (chunk-dense, mxu) vs XLA,
  4. camera-plane-crossing scenes (clipping semantics) across backends,
  5. deferred shading end-to-end (loss decreases over a short fit),
  6. closure-constant regression (jit-captured scenes match all-args),
  7. block-binned (CSR) kernel parity, forward and gradient,
  8. textured renderer gradients vs the CPU backend (texture gathers),
  9. the Mosaic scalar-SMEM miscompile repro harness (reports whether the
     compiler bug that killed the deleted round-1 scalar kernel persists).

Run from the repo root with the TPU env untouched:  python tests_tpu.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/dirt_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dirt_tpu
from dirt_tpu.ops import backward, dispatch, grad_dense, grad_mxu
from dirt_tpu.utils import meshes, oracle

FAILURES = []


def check(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"PASS {name} ({time.perf_counter() - t0:.0f}s)", flush=True)
    except Exception as exc:  # noqa: BLE001 - report and continue
        FAILURES.append(name)
        print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:500]}",
              flush=True)


def square_test():
    # The reference's only automated check (tests/square_test.py): an
    # axis-aligned white square must match the analytic pixel-coverage
    # formula EXACTLY.  Reference scene constants: 128 px, square from 32
    # to 96 (tests/square_test.py:11-36).
    size, lo, hi = 128, 32., 96.
    x0 = lo * 2. / size - 1.
    x1 = hi * 2. / size - 1.
    v = np.array([[x0, x0, 0, 1], [x1, x0, 0, 1],
                  [x1, x1, 0, 1], [x0, x1, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    c = np.ones((4, 1), np.float32)
    bg = np.zeros((size, size, 1), np.float32)
    cols = np.arange(size) + 0.5
    inside = (cols >= lo) & (cols < hi)
    want = (inside[None, :] & inside[::-1, None]).astype(np.float32)[..., None]
    for backend in ("pallas", "dense"):
        px = jax.jit(lambda b, vv, cc, ff: dirt_tpu.rasterise(
            b, vv, cc, ff, backend=backend),
            static_argnames=())(bg, v, c, f)
        got = np.asarray(px)
        assert (got == want).all(), (
            f"{backend}: {int((got != want).sum())} pixels disagree")


def soup_parity():
    rng = np.random.RandomState(0)
    v = rng.randn(2, 80, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 80, size=(2, 60, 3)).astype(np.int32)
    c = rng.uniform(size=(2, 80, 3)).astype(np.float32)
    bg = rng.uniform(size=(2, 64, 128, 3)).astype(np.float32)
    outs = {}
    for backend in ("reference", "pallas", "dense", "blocks"):
        px, aux = jax.jit(lambda b, vv, cc, ff, _bk=backend:
                          dispatch.forward_batch(b, vv, cc, ff, _bk))(
            bg, v, c, f)
        outs[backend] = (np.asarray(px), np.asarray(aux.face_index))
    ref_px, ref_idx = outs["reference"]
    for backend in ("pallas", "dense", "blocks"):
        px, idx = outs[backend]
        assert (idx == ref_idx).all(), (
            f"{backend}: {int((idx != ref_idx).sum())} visibility mismatches")
        np.testing.assert_allclose(px, ref_px, atol=1e-4, rtol=1e-5)
    want_px, want_idx = oracle.rasterise(bg[0], v[0], c[0], f[0])
    assert (ref_idx[0] == want_idx).all(), "native oracle visibility"
    np.testing.assert_allclose(ref_px[0], want_px, atol=1e-4, rtol=1e-5)


def grad_parity():
    rng = np.random.RandomState(3)
    v = rng.randn(2, 60, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 60, size=(2, 40, 3)).astype(np.int32)
    c = rng.uniform(size=(2, 60, 3)).astype(np.float32)
    bg = rng.uniform(size=(2, 64, 128, 3)).astype(np.float32)
    gp = rng.randn(2, 64, 128, 3).astype(np.float32)
    px, aux = jax.jit(lambda b, vv, cc, ff: dispatch.forward_batch(
        b, vv, cc, ff, "pallas"))(bg, v, c, f)
    g_xla = jax.jit(lambda vv, ff, pp, gg: backward.rasterise_grad_batch(
        vv, ff, pp, gg, aux, implementation="xla"))(v, f, px, gp)
    # (The round-1 face-major scalar kernel Mosaic miscompiled on device was
    # deleted in round 3; repro/mosaic_scalar_smem_accum.py isolates the
    # compiler bug and is exercised by the mosaic_repro check below.)
    for kernel, label in ((grad_dense, "dense"), (grad_mxu, "mxu")):
        g_k = jax.jit(lambda vv, ff, pp, gg, _k=kernel:
                      _k.rasterise_grad_batch(vv, ff, pp, gg, aux,
                                              interpret=False))(v, f, px, gp)
        for name in ("grad_vertices", "grad_vertex_colors",
                     "grad_background"):
            a = np.asarray(getattr(g_xla, name))
            b = np.asarray(getattr(g_k, name))
            scale = max(np.abs(a).max(), 1.0)
            err = np.abs(a / scale - b / scale).max()
            assert err < 1e-5, f"{label} {name}: rel err {err:.2e}"
    # Multi-chunk mxu on device: the regime where the deleted scalar kernel
    # miscompiled.  Shrinking CHUNK makes the 40-face scene span 3 chunks.
    saved_chunk = grad_mxu.CHUNK
    grad_mxu.CHUNK = 16
    try:
        g_k = jax.jit(lambda vv, ff, pp, gg: grad_mxu.rasterise_grad_batch(
            vv, ff, pp, gg, aux, interpret=False))(v, f, px, gp)
        for name in ("grad_vertices", "grad_vertex_colors"):
            a = np.asarray(getattr(g_xla, name))
            b = np.asarray(getattr(g_k, name))
            scale = max(np.abs(a).max(), 1.0)
            err = np.abs(a / scale - b / scale).max()
            assert err < 1e-5, f"mxu multi-chunk {name}: rel err {err:.2e}"
    finally:
        grad_mxu.CHUNK = saved_chunk


def crossing_scene():
    sys.path.insert(0, "tests")
    from test_clipping import _crossing_scene
    bg, v, c, f = _crossing_scene()
    outs = {}
    for backend in ("reference", "pallas", "dense", "blocks"):
        px, aux = jax.jit(lambda b, vv, cc, ff, _bk=backend:
                          dispatch.forward_batch(b, vv, cc, ff, _bk))(
            bg, v, c, f)
        outs[backend] = np.asarray(aux.face_index)
    assert (outs["pallas"] == outs["reference"]).all()
    assert (outs["dense"] == outs["reference"]).all()
    assert (outs["blocks"] == outs["reference"]).all()
    assert not (outs["reference"] == 2).any()   # behind-camera face clipped


def deferred_fit():
    rng = np.random.RandomState(0)
    verts, faces, front, back = meshes.two_squares()
    attrs_true = jnp.asarray(rng.uniform(size=(8, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(32, 64, 3)).astype(np.float32))
    shader = lambda g: g ** 2 + 0.1 * g
    v_j, f_j = jnp.asarray(verts), jnp.asarray(faces)

    def render(a):
        return dirt_tpu.rasterise_deferred(bg, v_j, a, f_j, shader_fn=shader)

    target = render(attrs_true)

    # lr 0.005: the sum-of-squares loss over 32x64x3 pixels has gradients
    # of magnitude ~100 at the start point, so 0.05 overshoots and diverges
    # (on CPU and TPU alike -- verified; the gradients themselves match the
    # interpreter bit-for-bit).
    @jax.jit
    def fit_step(a):
        loss, grad = jax.value_and_grad(
            lambda aa: jnp.sum((render(aa) - target) ** 2))(a)
        return a - 0.005 * grad, loss

    a = attrs_true + 0.3
    first = None
    for _ in range(20):
        a, loss = fit_step(a)
        first = float(loss) if first is None else first
    assert np.isfinite(float(loss))
    assert float(loss) < 0.5 * first, (first, float(loss))


def deferred_fused_parity():
    # Round-5 fused deferred backward: one parts="all"-shaped sweep with a
    # separate colour cotangent (backward.rasterise_grad_deferred) must be
    # BITWISE-equal on device to the two-call parts="position"+"color"
    # form.  4-channel G-buffer exercises the 3+1 group pairing; 60 faces
    # over 64x128 spans several face blocks of the production kernel.
    from dirt_tpu.ops import backward, dispatch
    rng = np.random.RandomState(23)
    v = rng.randn(2, 60, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, 60, size=(2, 45, 3)).astype(np.int32)
    a = rng.uniform(size=(2, 60, 4)).astype(np.float32)
    bg = rng.uniform(size=(2, 64, 128, 4)).astype(np.float32)
    v, f, a, bg = map(jnp.asarray, (v, f, a, bg))
    gbuffer, aux = jax.jit(
        lambda vv: dispatch.forward_batch(bg, vv, a, f))(v)
    light = jnp.asarray([0.8, 0.6, 0.4, 0.2])
    shader = lambda gb: jnp.tanh(gb * light)[..., :3]
    pixels, shader_vjp = jax.vjp(shader, gbuffer)
    gp = jnp.asarray(rng.randn(
        *np.asarray(pixels).shape).astype(np.float32))
    (ggb,) = shader_vjp(gp)

    def two_call(vv):
        _, gv, _ = backward.rasterise_grad_grouped(
            vv, f, pixels, gp, aux, parts="position")
        gb_, _, ga = backward.rasterise_grad_grouped(
            vv, f, gbuffer, ggb, aux, parts="color")
        return gb_, gv, ga

    def fused(vv):
        return backward.rasterise_grad_deferred(
            vv, f, pixels, gp, gbuffer, ggb, aux)

    ref = jax.jit(two_call)(v)
    got = jax.jit(fused)(v)
    for name, r, g in zip(("background", "vertices", "attributes"),
                          ref, got):
        r, g = np.asarray(r), np.asarray(g)
        assert np.array_equal(r, g), (
            name, float(np.abs(r - g).max()))


def closure_constant_regression():
    # Scene data captured as jit closure constants must render/differentiate
    # identically to the all-args call.  Regression for the round-2 relay
    # constant-folding corruption (the folded corner-attribute gather zeroed
    # channels >= 1); dispatch.guard_constants couples constants to a tracer
    # through one joint optimization_barrier -- a per-leaf barrier on
    # concrete arrays executes eagerly and protects nothing.
    rng = np.random.RandomState(11)
    v = rng.randn(2, 60, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = jnp.asarray(rng.randint(0, 60, size=(2, 45, 3)).astype(np.int32))
    c = jnp.asarray(rng.uniform(size=(2, 60, 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(2, 64, 128, 3)).astype(np.float32))
    w = jnp.asarray(rng.uniform(size=(2, 64, 128, 3)).astype(np.float32))

    px_c = jax.jit(lambda vv: dirt_tpu.rasterise_batch(bg, vv, c, f))(
        jnp.asarray(v))
    px_a = jax.jit(dirt_tpu.rasterise_batch)(
        bg, jnp.asarray(v), c, f)
    assert (np.asarray(px_c) == np.asarray(px_a)).all(), "forward closure"

    g_c = jax.jit(jax.grad(lambda vv: jnp.sum(
        dirt_tpu.rasterise_batch(bg, vv, c, f) * w)))(jnp.asarray(v))
    g_a = jax.jit(jax.grad(lambda vv, b_, c_, f_, w_: jnp.sum(
        dirt_tpu.rasterise_batch(b_, vv, c_, f_) * w_)))(
        jnp.asarray(v), bg, c, f, w)
    assert np.isfinite(np.asarray(g_c)).all(), "closure grads not finite"
    assert (np.asarray(g_c) == np.asarray(g_a)).all(), "grad closure"


def blocks_backend_parity():
    # The block-binned kernels (forward_blocks / grad_blocks) vs the
    # per-face-exact paths, at a face count that spans several blocks.
    rng = np.random.RandomState(17)
    n = 400
    v = rng.randn(2, n, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, n, size=(2, 300, 3)).astype(np.int32)
    c = rng.uniform(size=(2, n, 3)).astype(np.float32)
    bg = rng.uniform(size=(2, 64, 128, 3)).astype(np.float32)
    gp = rng.randn(2, 64, 128, 3).astype(np.float32)
    px_b, aux_b = jax.jit(lambda b, vv, cc, ff: dispatch.forward_batch(
        b, vv, cc, ff, "blocks"))(bg, v, c, f)
    px_d, aux_d = jax.jit(lambda b, vv, cc, ff: dispatch.forward_batch(
        b, vv, cc, ff, "dense"))(bg, v, c, f)
    assert (np.asarray(aux_b.face_index)
            == np.asarray(aux_d.face_index)).all(), "blocks visibility"
    np.testing.assert_array_equal(np.asarray(px_b), np.asarray(px_d))
    g_d = jax.jit(lambda vv, ff, pp, gg: backward.rasterise_grad_batch(
        vv, ff, pp, gg, aux_b, implementation="dense"))(v, f, px_b, gp)
    g_b = jax.jit(lambda vv, ff, pp, gg: backward.rasterise_grad_batch(
        vv, ff, pp, gg, aux_b, implementation="blocks"))(v, f, px_b, gp)
    for name in ("grad_vertices", "grad_vertex_colors", "grad_background"):
        a = np.asarray(getattr(g_d, name))
        b = np.asarray(getattr(g_b, name))
        scale = max(np.abs(a).max(), 1.0)
        err = np.abs(a / scale - b / scale).max()
        assert err < 1e-5, f"blocks {name}: rel err {err:.2e}"

    # Fused-CSR vs slot schedules on device: the schedule change must be
    # bitwise-invisible (same sweep expression tree, same visit order) --
    # the strictest cross-check available for the manual-DMA kernels.
    # The gradient's accumulation order is partition-sensitive, so pin the
    # slot run to the fused autos' partition (the schedules' own autos
    # differ: 8-row tiles fused vs 16 slot; t4/c64 vs t32/c128 forward).
    from dirt_tpu.ops import forward_blocks, grad_blocks
    fwd_saved, grad_saved = forward_blocks.FUSED, grad_blocks.FUSED
    pins_saved = (forward_blocks.TILE_H, forward_blocks.CHUNK,
                  grad_blocks.TILE_H)
    # Resolve the partition the runs above actually used (before flipping
    # FUSED: the autos consult it).
    fwd_th, fwd_ck = forward_blocks.tile_h_for(), forward_blocks.chunk_for()
    grad_th = grad_blocks.tile_h_for(f.shape[1])
    try:
        forward_blocks.FUSED = not fwd_saved
        grad_blocks.FUSED = not grad_saved
        forward_blocks.TILE_H, forward_blocks.CHUNK = fwd_th, fwd_ck
        grad_blocks.TILE_H = grad_th
        px_o, aux_o = jax.jit(lambda b, vv, cc, ff: dispatch.forward_batch(
            b, vv, cc, ff, "blocks"))(bg, v, c, f)
        assert (np.asarray(px_o) == np.asarray(px_b)).all(), \
            "fused/slot forward schedules disagree on device"
        assert (np.asarray(aux_o.face_index)
                == np.asarray(aux_b.face_index)).all()
        g_o = jax.jit(lambda vv, ff, pp, gg: backward.rasterise_grad_batch(
            vv, ff, pp, gg, aux_b, implementation="blocks"))(v, f, px_b, gp)
        for name in ("grad_vertices", "grad_vertex_colors"):
            assert (np.asarray(getattr(g_o, name))
                    == np.asarray(getattr(g_b, name))).all(), \
                f"fused/slot gradient schedules disagree on device: {name}"
    finally:
        forward_blocks.FUSED, grad_blocks.FUSED = fwd_saved, grad_saved
        (forward_blocks.TILE_H, forward_blocks.CHUNK,
         grad_blocks.TILE_H) = pins_saved


def spatial_sort_parity():
    # Morton face re-blocking (DIRT_TPU_SPATIAL_SORT) on device: the
    # forward must be bitwise invariant (order-independent lexicographic
    # winner pick), gradients equal up to segment-sum summation order.
    # The random face soup is maximally draw-order-incoherent, the regime
    # the sort exists for.
    from dirt_tpu.ops import forward_blocks
    rng = np.random.RandomState(23)
    n = 400
    v = rng.randn(2, n, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, n, size=(2, 300, 3)).astype(np.int32)
    c = rng.uniform(size=(2, n, 3)).astype(np.float32)
    bg = rng.uniform(size=(2, 64, 128, 3)).astype(np.float32)
    gp = rng.randn(2, 64, 128, 3).astype(np.float32)
    fwd = jax.jit(lambda b, vv, cc, ff: dispatch.forward_batch(
        b, vv, cc, ff, "blocks"))
    bwd = jax.jit(lambda vv, ff, pp, gg, aa: backward.rasterise_grad_batch(
        vv, ff, pp, gg, aa, implementation="blocks"))
    saved = forward_blocks.SPATIAL
    try:
        forward_blocks.SPATIAL = False
        px0, aux0 = fwd(bg, v, c, f)
        g0 = bwd(v, f, px0, gp, aux0)
        forward_blocks.SPATIAL = True
        px1, aux1 = fwd(bg, v, c, f)
        g1 = bwd(v, f, px1, gp, aux1)
    finally:
        forward_blocks.SPATIAL = saved
    assert (np.asarray(aux1.face_index)
            == np.asarray(aux0.face_index)).all(), "spatial visibility"
    np.testing.assert_array_equal(np.asarray(px1), np.asarray(px0))
    for name in ("grad_vertices", "grad_vertex_colors"):
        a = np.asarray(getattr(g0, name))
        b = np.asarray(getattr(g1, name))
        scale = max(np.abs(a).max(), 1.0)
        err = np.abs(a / scale - b / scale).max()
        assert err < 1e-5, f"spatial {name}: rel err {err:.2e}"
    np.testing.assert_array_equal(np.asarray(g0.grad_background),
                                  np.asarray(g1.grad_background))


def resident_parity():
    # Resident VMEM table mode (DIRT_TPU_BLOCKS_RESIDENT_MB /
    # DIRT_TPU_GRAD_RESIDENT_MB) on device: per-image VMEM BlockSpec +
    # dynamic in-kernel block indexing must reproduce the per-visit
    # manual-DMA schedule bit-for-bit on BOTH passes (identical sweep
    # expression tree and visit order; only the transport differs).
    # Dynamic-index VMEM reads are a new Mosaic pattern -- this is the
    # multi-chunk/multi-tile device parity check the trap rules demand.
    from dirt_tpu.ops import forward_blocks, grad_blocks
    rng = np.random.RandomState(29)
    n = 400
    v = rng.randn(2, n, 4).astype(np.float32)
    v[..., 3] = np.abs(v[..., 3]) + 0.5
    f = rng.randint(0, n, size=(2, 300, 3)).astype(np.int32)
    c = rng.uniform(size=(2, n, 3)).astype(np.float32)
    bg = rng.uniform(size=(2, 64, 128, 3)).astype(np.float32)
    gp = rng.randn(2, 64, 128, 3).astype(np.float32)
    saved = forward_blocks.RESIDENT_MB, grad_blocks.RESIDENT_MB
    try:
        forward_blocks.RESIDENT_MB = -1.0
        grad_blocks.RESIDENT_MB = -1.0
        px0, aux0 = jax.jit(lambda b, vv, cc, ff, m=0: dispatch.forward_batch(
            b, vv, cc, ff, "blocks"))(bg, v, c, f)
        g0 = jax.jit(lambda vv, ff, pp, gg, m=0: backward.rasterise_grad_batch(
            vv, ff, pp, gg, aux0, implementation="blocks"))(v, f, px0, gp)
        forward_blocks.RESIDENT_MB = 1000.0
        grad_blocks.RESIDENT_MB = 1000.0
        px1, aux1 = jax.jit(lambda b, vv, cc, ff, m=1: dispatch.forward_batch(
            b, vv, cc, ff, "blocks"))(bg, v, c, f)
        g1 = jax.jit(lambda vv, ff, pp, gg, m=1: backward.rasterise_grad_batch(
            vv, ff, pp, gg, aux0, implementation="blocks"))(v, f, px0, gp)
    finally:
        forward_blocks.RESIDENT_MB, grad_blocks.RESIDENT_MB = saved
    assert (np.asarray(aux1.face_index)
            == np.asarray(aux0.face_index)).all(), "resident visibility"
    np.testing.assert_array_equal(np.asarray(px1), np.asarray(px0))
    for name in ("grad_vertices", "grad_vertex_colors", "grad_background"):
        assert (np.asarray(getattr(g1, name))
                == np.asarray(getattr(g0, name))).all(), \
            f"resident/DMA gradient schedules disagree on device: {name}"


_TEXTURED_GRAD_SNIPPET = """
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/dirt_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from dirt_tpu.models import TexturedRenderer
from dirt_tpu.utils import meshes

rng = np.random.RandomState(0)
v, f = meshes.build_cube()
uvs = jnp.asarray(rng.uniform(size=(8, 2)).astype(np.float32))
texture = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
model = TexturedRenderer(width=64, height=48)
light = jnp.asarray([1., -0.3, -0.5])
light = light / jnp.linalg.norm(light)

def loss(tex, vv, ff, uu, ll):
    return jnp.sum(model.render(
        vv, ff, uu, tex, jnp.asarray([0.2, 0.7, 0.]), ll))

with jax.default_matmul_precision("highest"):
    g = jax.jit(jax.grad(loss))(
        texture, jnp.asarray(v), jnp.asarray(f), uvs, light)
np.save(OUT_PATH, np.asarray(g))
"""


def _textured_grad_cpu():
    """Computes the texture gradient on the CPU backend in a subprocess
    (the live process's platform is fixed at first jax use) and returns it."""
    import os
    import subprocess
    import tempfile
    out_path = tempfile.mktemp(suffix=".npy", prefix="dirt_tpu_texgrad_")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""     # skip the TPU-relay handshake
    snippet = f"OUT_PATH = {out_path!r}\n" + _TEXTURED_GRAD_SNIPPET
    subprocess.run([sys.executable, "-c", snippet], env=env, check=True,
                   cwd=os.path.dirname(os.path.abspath(__file__)),
                   timeout=900)
    g = np.load(out_path)
    os.unlink(out_path)
    return g


def textured_model():
    # TexturedRenderer end-to-end compiled on device: the deferred path plus
    # per-pixel texture-sampling GATHERS (a codepath the raster kernels never
    # exercise).  Texture gradients must be finite, non-trivial, and match
    # the values the same program computes on the CPU backend (computed in a
    # CPU subprocess, since this process's platform is pinned to the TPU).
    from dirt_tpu.models import TexturedRenderer

    rng = np.random.RandomState(0)
    v, f = meshes.build_cube()
    uvs = jnp.asarray(rng.uniform(size=(8, 2)).astype(np.float32))
    texture = jnp.asarray(rng.uniform(size=(32, 32, 3)).astype(np.float32))
    model = TexturedRenderer(width=64, height=48)
    light = jnp.asarray([1., -0.3, -0.5])
    light = light / jnp.linalg.norm(light)

    def loss(tex, vv, ff, uu, ll):
        return jnp.sum(model.render(
            vv, ff, uu, tex, jnp.asarray([0.2, 0.7, 0.]), ll))

    # Pin matmul precision on BOTH sides: the scene-math matmuls
    # (world @ view @ projection) otherwise run at the TPU's default bf16
    # MXU precision, moving clip coordinates (and hence G-buffer UVs) by
    # ~1e-3 relative vs CPU -- measured 6.8e-2 texture-grad divergence with
    # ZERO winner flips.  At "highest" the same comparison lands at 3e-6.
    with jax.default_matmul_precision("highest"):
        g = jax.jit(jax.grad(loss))(
            texture, jnp.asarray(v), jnp.asarray(f), uvs, light)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.01
    g_cpu = _textured_grad_cpu()
    # FMA contraction differs between the TPU and CPU compilers; the values
    # must agree to rounding, not bit-exactly.
    scale = max(np.abs(g_cpu).max(), 1.0)
    err = np.abs(g / scale - g_cpu / scale).max()
    assert err < 1e-5, f"texture grads vs CPU: rel err {err:.2e}"


def mosaic_repro():
    # The minimised Mosaic scalar-SMEM-accumulation repro
    # (repro/mosaic_scalar_smem_accum.py).  The interpreter path must match
    # numpy (harness sanity); the compiled path's outcome is REPORTED, not
    # asserted -- on the stack where the production kernel was deleted the
    # bug reproduces, and a future toolchain may fix it.
    sys.path.insert(0, "repro")
    import mosaic_scalar_smem_accum as repro

    got_c, planes, ids = repro.run(interpret=False)
    got_i, _, _ = repro.run(interpret=True)
    want = repro.reference(planes, ids)
    assert np.abs(got_i - want).max() < 1e-3, "repro harness broken"
    err_c = np.abs(got_c - want).max()
    status = ("NOT PRESENT on this stack" if np.isfinite(got_c).all()
              and err_c < 1e-3 else f"REPRODUCES (max err {err_c:.3e})")
    print(f"  mosaic scalar-SMEM miscompile: {status}", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    check("square exactness (pallas + dense)", square_test)
    check("random-soup parity (3 backends + oracle)", soup_parity)
    check("gradient-kernel parity (dense + mxu vs xla)", grad_parity)
    check("camera-crossing clipping semantics", crossing_scene)
    check("deferred shading end-to-end fit", deferred_fit)
    check("fused deferred backward bitwise parity", deferred_fused_parity)
    check("closure-constant regression (fwd + grad)",
          closure_constant_regression)
    check("block-binned kernels parity (fwd + grad)", blocks_backend_parity)
    check("spatial-sort re-blocking parity (fwd + grad)", spatial_sort_parity)
    check("resident VMEM table parity (fwd + grad)", resident_parity)
    check("textured renderer grads on device", textured_model)
    check("mosaic miscompile repro harness", mosaic_repro)
    if FAILURES:
        print("FAILED:", FAILURES, flush=True)
        return 1
    print("ALL TPU CHECKS PASSED", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
