"""Device A/B for the round-5 sweep-algebra folds (DIRT_TPU_SWEEP_FOLD /
DIRT_TPU_GRAD_FOLD).

OUTCOME (recorded 2026-08-20, TPU v5e; this script is provenance of a
REMOVED feature and no longer runs at HEAD -- the .FOLD flags are gone):
the folds LOST 2-5% at every size on both passes despite counting 4-5
plane ops cheaper, BIT-EXACT parity throughout (fwd 2.10->2.14 /
6.06->6.39 / 24.91->26.08 ms, bwd 1.87->1.92 / 5.56->5.71 /
23.88->24.34 ms at 512/2048/8192 faces).  Mosaic lesson: float selects
with broadcast operands cost more than boolean chains or broadcast-free
plane muls.  Full table + analysis in BASELINE.md round-5 section.

Motivation (VERDICT r4 items 3-4): COVER_FAST proved the fused sweeps are
VPU-issue-bound -- ops cut track time cut (~12 of ~100 forward ops ->
-12.8% at 512 faces).  This A/B measures the next round of algebra, each
arm proven bitwise-identical on CPU and pinned in
tests/test_bitwise_invariants.py:

  forward (DIRT_TPU_SWEEP_FOLD, forward_dense._chunk_candidates):
    * fill-rule zero fold: (E > 0) | ((E == 0) & a) == (where(E == 0,
      a ? +1 : -1, E) > 0) -- 4 ops per edge instead of 5 (-3);
    * winner-mask fold: reuse the where(at_best, orig, BIG) plane from
      the best_orig reduction; key == best_orig IS the winner mask (-1).
  gradient (DIRT_TPU_GRAD_FOLD, grad_dense._chunk_sums):
    * per-pixel weight products (bary_d_k*ax, bary_d_k*ay,
      bary_pre_k*grad_c) move to [1, PIX] rows before the mask select,
      and the three gw_k corners share ONE masked-p plane -- 5 fewer
      [CHUNK, PIX] elementwise ops of ~39 per visit.

Both arms interleaved (x2) to cancel relay load drift; forward parity
bitwise, gradient parity bitwise arm-vs-arm + relerr vs the XLA path.

Usage (repo root, TPU env untouched):  python -m sweeps._sweep_fold
"""
import statistics
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

from dirt_tpu.ops import backward, dispatch, forward_dense, grad_dense
import bench as B

REPEATS = 5


def slope_time(make_runner, seed_arg, scene, tag, iters):
    short_fn = make_runner(iters)
    long_fn = make_runner(3 * iters)
    B.drain(short_fn(seed_arg, *scene))
    B.drain(long_fn(seed_arg, *scene))
    for attempt in range(3):
        base = 1e-6 * (10 ** attempt)

        def timed(fn, offs):
            times = []
            for k in offs:
                t0 = time.perf_counter()
                B.drain(fn(seed_arg + base * k, *scene))
                times.append(time.perf_counter() - t0)
            return statistics.median(times)

        t_s = timed(short_fn, range(1, REPEATS + 1))
        t_l = timed(long_fn, range(REPEATS + 1, 2 * REPEATS + 1))
        slope = t_l - t_s
        if slope > 0 and slope >= 0.3 * t_s:
            return slope * 1e3 / (2 * iters)
        print(f"  [{tag}] implausible slope; retry", flush=True)
    print(f"  [{tag}] TIMING FAILED", flush=True)
    return None


def probe(segments, iters):
    batch, res = 16, 256
    bg, clip, colors, faces, weights = B.build_scene(batch, res, segments)
    print(f"=== {faces.shape[1]} faces ===", flush=True)

    def fwd_runner(length):
        def run(c0, bg_a, col_a, f_a, w_a, s=forward_dense.FOLD):
            del s  # closure tag: distinct jit per flag value
            def body(c, _):
                p, _ = dispatch.forward_batch(bg_a, c, col_a, f_a, "blocks")
                return c + 1e-20 * jnp.sum(p * w_a), ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    # Forward arms, interleaved.
    fref, fres = None, {}
    for arm in (False, True, False, True):
        forward_dense.FOLD = arm
        tag = "fold" if arm else "base"
        p, a = jax.jit(lambda c, s=arm: dispatch.forward_batch(
            bg[:1], c, colors[:1], faces[:1], "blocks"))(clip[:1])
        cur = (np.asarray(p), np.asarray(a.face_index))
        if fref is None:
            fref, ptag = cur, "ref"
        else:
            same = all(np.array_equal(x, y) for x, y in zip(fref, cur))
            ptag = "BIT-EXACT" if same else "PARITY-FAIL"
        ms = slope_time(fwd_runner, clip, (bg, colors, faces, weights),
                        f"fwd-{tag}", iters)
        print(f"fwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag})", flush=True)
        if ms is not None:
            fres.setdefault(tag, []).append(ms)
    forward_dense.FOLD = False
    for tag, vals in sorted(fres.items()):
        print(f"  median fwd {tag}: {round(statistics.median(vals), 2)} ms",
              flush=True)

    # Gradient arms.
    px, aux = jax.jit(lambda c: dispatch.forward_batch(
        bg, c, colors, faces))(clip)
    gp = weights
    gx = jax.jit(lambda v: backward.rasterise_grad_batch(
        v, faces, px, gp, aux, implementation="xla"))(clip)
    gx = tuple(np.asarray(x) for x in
               (gx.grad_background, gx.grad_vertices, gx.grad_vertex_colors))

    def bwd_runner(length):
        def run(c0, gp0, v, f, s=grad_dense.FOLD):
            del s  # closure tag
            def body(c, _):
                g = backward.rasterise_grad_batch(
                    v, f, px, gp0 + 1e-20 * c, aux,
                    implementation="blocks")
                feedback = (jnp.sum(g.grad_background)
                            + jnp.sum(g.grad_vertices)
                            + jnp.sum(g.grad_vertex_colors))
                return c + 1e-20 * feedback, ()
            return jax.lax.scan(body, c0, None, length=length)[0]
        return jax.jit(run)

    gref, gres = None, {}
    for arm in (False, True, False, True):
        grad_dense.FOLD = arm
        tag = "fold" if arm else "base"
        g = jax.jit(lambda v, s=arm: backward.rasterise_grad_batch(
            v, faces, px, gp, aux, implementation="blocks"))(clip)
        cur = tuple(np.asarray(x) for x in
                    (g.grad_background, g.grad_vertices,
                     g.grad_vertex_colors))
        rel = max(
            float(np.abs(c - x).max() / (np.abs(x).max() + 1e-30))
            for c, x in zip(cur, gx))
        if gref is None:
            gref, ptag = cur, "ref"
        else:
            same = all(np.array_equal(x, y) for x, y in zip(gref, cur))
            ptag = "BIT-EXACT" if same else "PARITY-FAIL"
        ms = slope_time(bwd_runner, jnp.float32(0.0), (gp, clip, faces),
                        f"bwd-{tag}", iters)
        print(f"bwd {tag}: {ms if ms is None else round(ms, 2)} ms "
              f"({ptag}, relerr-vs-xla {rel:.1e})", flush=True)
        if ms is not None:
            gres.setdefault(tag, []).append(ms)
    grad_dense.FOLD = False
    for tag, vals in sorted(gres.items()):
        print(f"  median bwd {tag}: {round(statistics.median(vals), 2)} ms",
              flush=True)


if __name__ == "__main__":
    probe(64, iters=100)
    probe(256, iters=60)
    probe(1024, iters=20)
    print("done", flush=True)
