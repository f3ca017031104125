"""Benchmark: batched 256x256 rasterisation, forward + backward, per chip.

The headline metric from BASELINE.json: frames/sec/chip for batched 256^2
rasterise fwd+bwd on a Gouraud-shaded mesh.  The reference publishes no
numbers (BASELINE.md), so this harness *establishes* the baseline; the value
recorded by the driver in BENCH_r{N}.json tracks round-over-round progress.

Prints exactly one JSON line on success:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N,
   "spread_pct": N}
and EXITS NON-ZERO on any measurement failure instead of printing a number.
The reference's correctness floor is pass/fail (tests/square_test.py:54-57
must print "successful"); this harness applies the same philosophy to its
own timing:

  * The oracle parity gate always runs (eager AND jitted paths) -- a wrong
    image means no benchmark number, period.
  * The lax.scan slope (t_long - t_short) must be plausible: positive and
    at least 30% of t_short (the long scan runs 3x the iterations, so a
    genuine measurement has slope ~ 2x t_short minus constant overhead; the
    axon relay's content-caching failure mode returns near-zero or negative
    slopes).  Implausible slopes are re-measured with fresh input nonces;
    after MAX_ATTEMPTS failures the harness exits non-zero.
  * Each scan length is timed as the MEDIAN of an odd number of repeats,
    each on a freshly perturbed input (identical (executable, input) pairs
    are sporadically content-cached by the relay; min-of-N selects exactly
    the cached lie).
  * The final value is sanity-bounded against the best honest recorded
    number (a >10x jump in one round is a measurement artifact, not a
    speedup; round 2's driver artifact recorded 16e9 frames/sec from a
    silently clamped non-positive slope).
  * DRIFT AWARENESS (round 4): the relay's load drift spans 2763-3701
    f/s at identical code (+-15%), so one slope cannot distinguish a real
    regression from drift.  The harness runs GROUPS interleaved slope
    groups spread over the run's wall-clock, reports the MEDIAN as the
    value plus the max-min spread as ``spread_pct``, and when the spread
    exceeds SPREAD_LIMIT it re-measures the whole set once, then fails
    rather than publish a number the drift band swallows.

Environment knobs:
  DIRT_BENCH_BATCH / DIRT_BENCH_RES / DIRT_BENCH_SEGMENTS / DIRT_BENCH_ITERS
  DIRT_BENCH_BACKEND (default: auto -> dense/blocks on TPU)
  DIRT_BENCH_POISON_SLOPE=1  test hook: simulates the relay content-cache
    failure (forces a non-positive slope) so tests can assert the harness
    refuses to print a number (tests/test_bench_harness.py).
"""

import json
import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compile cache: repeated bench runs reuse the remote-compiled
# executables instead of paying the 5-20 min relay compile again.  NEVER
# share a cache dir between the axon and cpu platforms (CLAUDE.md): pick by
# the platform actually in use.
jax.config.update(
    'jax_compilation_cache_dir',
    '/tmp/dirt_tpu_jax_cache_cpu' if os.environ.get('JAX_PLATFORMS') == 'cpu'
    else '/tmp/dirt_tpu_jax_cache_tpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu import matrices
from dirt_tpu.utils import meshes

# Throughput of a V100 running the reference at this config is the north-star
# comparison (BASELINE.json); no published number exists, so vs_baseline is
# reported against this locally-measured round-1 anchor.
ROUND1_ANCHOR = 520.9   # frames/sec/chip measured in round 1 (TPU v5e)
RECORD_BEST = 4322.2    # best honest recorded value (round 5, TPU v5e)
MAX_ATTEMPTS = 3        # slope re-measurements before giving up
REPEATS = 5             # odd; median defeats one-off relay cache hits
GROUPS = 3              # interleaved slope groups; median defeats drift
# Max (max-min)/median spread across groups, percent, before the set is
# re-measured (once) and then rejected.  The documented relay drift is
# +-15% across QUARTER-HOURS; within one run's minutes it must be tighter.
SPREAD_LIMIT = float(os.environ.get("DIRT_BENCH_SPREAD_LIMIT", "20"))
DEFAULT_CONFIG = (16, 256, 64)   # (batch, res, segments) of the headline


def fail(message):
    print(f"bench.py: MEASUREMENT FAILURE: {message}", file=sys.stderr,
          flush=True)
    sys.exit(2)


def drain(x):
    """Force completion of every queued execution before returning.

    On the axon relay backend, ``jax.block_until_ready`` can return once the
    execution is ENQUEUED rather than completed (observed 2026-08-18: 30-step
    fwd+bwd scans "completing" in 60 us wall-clock with fresh inputs); only a
    device->host transfer provably drains the pipeline.  Every timed call
    must end with a drain so (a) the timing covers the real execution and
    (b) the next timed call starts from an idle device.  The transfer cost
    is constant per call and cancels in the two-length scan slope.
    """
    jax.block_until_ready(x)
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf)
    return x


def build_scene(batch, resolution, segments):
    rng = np.random.RandomState(0)
    vertices, faces = meshes.make_cylinder(0.5, 1.0, 0.1, 0.2, segments)
    num_vertices = vertices.shape[0]
    homogeneous = np.concatenate(
        [vertices, np.ones((num_vertices, 1), np.float32)], axis=1)

    view = matrices.compose(
        matrices.translation(jnp.asarray([0., 0., -3.0])),
        matrices.rodrigues(jnp.asarray([-0.4, 0., 0.])))
    projection = matrices.perspective_projection(
        near=0.1, far=20., right=0.25, aspect=1.)

    rotations = matrices.rodrigues(
        jnp.asarray(rng.uniform(-1, 1, size=(batch, 3)).astype(np.float32)))
    clip = jnp.einsum('vi,bij->bvj', jnp.asarray(homogeneous),
                      rotations) @ view @ projection

    colors = jnp.asarray(
        rng.uniform(size=(batch, num_vertices, 3)).astype(np.float32))
    background = jnp.asarray(
        rng.uniform(size=(batch, resolution, resolution, 3)).astype(np.float32))
    faces_b = jnp.broadcast_to(
        jnp.asarray(faces), (batch,) + faces.shape)
    weights = jnp.asarray(
        rng.uniform(size=(batch, resolution, resolution, 3)).astype(np.float32))
    return background, clip, colors, faces_b, weights


def parity_gate(background, clip, colors, faces):
    """Unconditional pre-timing parity gate vs the native C++ oracle.

    The first image must match the oracle's visibility exactly and pixels
    within FMA tolerance, on BOTH execution paths: eager (op-by-op) and
    compiled (the shape the timed loop runs).  Compiled-graph corruption
    through the remote-compile relay has been observed with exact visibility
    and wrong pixels, which an eager-only gate cannot catch.
    """
    from dirt_tpu.ops import dispatch as _dispatch
    from dirt_tpu.utils import oracle as _oracle
    want_pixels, want_index = _oracle.rasterise(
        np.asarray(background[0]), np.asarray(clip[0]),
        np.asarray(colors[0]), np.asarray(faces[0]))
    for tag, fwd in (
            ("eager", _dispatch.forward_batch),
            ("jitted", jax.jit(_dispatch.forward_batch))):
        pixels, aux = fwd(background[:1], clip[:1], colors[:1], faces[:1])
        if not (np.asarray(aux.face_index[0]) == want_index).all():
            fail(f"visibility parity failure vs native oracle ({tag})")
        try:
            np.testing.assert_allclose(
                np.asarray(pixels[0]), want_pixels, atol=1e-4, rtol=1e-5)
        except AssertionError as exc:
            fail(f"pixel parity failure vs native oracle ({tag}): {exc}")
    print("# parity vs native oracle: OK (eager + jitted)", flush=True)


def main():
    batch = int(os.environ.get("DIRT_BENCH_BATCH", "16"))
    resolution = int(os.environ.get("DIRT_BENCH_RES", "256"))
    segments = int(os.environ.get("DIRT_BENCH_SEGMENTS", "64"))
    iters = int(os.environ.get("DIRT_BENCH_ITERS", "20"))
    backend = os.environ.get("DIRT_BENCH_BACKEND") or None
    poison = bool(os.environ.get("DIRT_BENCH_POISON_SLOPE"))

    background, clip, colors, faces, weights = build_scene(
        batch, resolution, segments)

    # Parity gate before timing, ALWAYS (VERDICT r2: the one driver run that
    # mattered ran ungated).  Costs one image render; negligible.
    parity_gate(background, clip, colors, faces)

    def loss(clip_v, colors_v, background_v, faces_v, weights_v):
        pixels = dirt_tpu.rasterise_batch(
            background_v, clip_v, colors_v, faces_v, backend=backend)
        return jnp.sum(pixels * weights_v)

    grad_fn = jax.grad(loss, argnums=(0, 1, 2))

    # Iterate ON DEVICE inside one program: per-call host<->device dispatch
    # (especially through a remote-execution relay) would otherwise swamp the
    # sub-millisecond device time.  The tiny grad feedback creates a data
    # dependence so the scan cannot be collapsed; timing two scan lengths and
    # taking the slope removes the constant launch/transfer overhead.
    # Scene data rides as jit ARGUMENTS, not closure constants: tracers
    # cannot be constant-folded (the remote-compile relay corrupts folded
    # scene products -- see dispatch.guard_constants), and XLA is free to
    # hoist the loop-invariant parts of face setup out of the scan.
    def make_runner(length):
        def run(c, colors_a, background_a, faces_a, weights_a):
            def body(clip_c, _):
                g_clip, _, _ = grad_fn(clip_c, colors_a, background_a,
                                       faces_a, weights_a)
                return clip_c + 1e-20 * g_clip, ()
            return jax.lax.scan(body, c, None, length=length)[0]
        return jax.jit(run)

    short, long_ = make_runner(iters), make_runner(iters * 3)
    scene = (colors, background, faces, weights)

    def timed(fn, nonces):
        """Median over REPEATS runs, each on a freshly perturbed input.

        Fresh inputs defeat the relay's (executable, input) content cache;
        the median (not min) defeats a residual one-off cache hit -- the
        minimum would select exactly the cached lie.
        """
        times = []
        for nonce in nonces:
            t0 = time.perf_counter()
            drain(fn(clip + nonce, *scene))
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    # Warm up / compile both executables before any timing.
    drain(short(clip, *scene))
    drain(long_(clip, *scene))

    nonce_ids = iter(range(1, 1 << 20))

    def measure_group(tag):
        """One plausible slope (with re-measure attempts) -> s/step."""
        for attempt in range(MAX_ATTEMPTS):
            base = 1e-6 * (10 ** attempt)
            t_short = timed(short, [base * next(nonce_ids)
                                    for _ in range(REPEATS)])
            t_long = timed(long_, [base * next(nonce_ids)
                                   for _ in range(REPEATS)])
            if poison:
                # Test hook: simulate the relay content-cache failure mode
                # (the long scan "returns" instantly).
                t_long = t_short * 0.5
            slope = t_long - t_short
            # A genuine 3x-length scan has slope ~ 2 * t_short minus
            # constant dispatch overhead; anything under 30% of t_short
            # means at least one of the two timings is a cache/jitter lie.
            if slope >= 0.3 * t_short and slope > 0:
                return slope / (2 * iters)
            print(f"# implausible slope ({tag}, attempt {attempt + 1}): "
                  f"t_short={t_short:.4f}s t_long={t_long:.4f}s "
                  f"slope={slope:.4f}s -- re-measuring with fresh nonces",
                  file=sys.stderr, flush=True)
        fail(f"slope implausible after {MAX_ATTEMPTS} attempts "
             "(relay content-cache / jitter failure mode); refusing to "
             "print a number")

    def measure_set(tag):
        """GROUPS interleaved slope groups -> (median f/s, spread %)."""
        values = []
        for g in range(GROUPS):
            per_step = measure_group(f"{tag} group {g + 1}/{GROUPS}")
            values.append(batch / per_step)
            print(f"# {tag} group {g + 1}/{GROUPS}: "
                  f"{values[-1]:.1f} frames/sec/chip", flush=True)
        med = statistics.median(values)
        return med, 100.0 * (max(values) - min(values)) / med

    frames_per_sec, spread_pct = measure_set("set 1")
    if spread_pct > SPREAD_LIMIT:
        # Relay load drift (documented 2763-3701 f/s band) can spread one
        # set; a second full set gets one chance before the run is rejected
        # as drift-swamped.
        print(f"# spread {spread_pct:.1f}% exceeds {SPREAD_LIMIT:.0f}%; "
              "re-measuring the full set once", file=sys.stderr, flush=True)
        frames_per_sec, spread_pct = measure_set("set 2")
        if spread_pct > SPREAD_LIMIT:
            fail(f"group spread {spread_pct:.1f}% exceeds "
                 f"{SPREAD_LIMIT:.0f}% after a re-measure; relay drift "
                 "swamps the measurement -- refusing to print a number")
    # Sanity bound: at the headline config, reject anything >10x the best
    # honest recorded value -- physical speedups of that size do not happen
    # in one round, measurement artifacts do (BENCH_r02 recorded 16e9 f/s).
    cap = (10 * RECORD_BEST
           if (batch, resolution, segments) == DEFAULT_CONFIG else 1e6)
    if frames_per_sec > cap:
        fail(f"value {frames_per_sec:.1f} frames/sec/chip exceeds the "
             f"sanity bound {cap:.0f} (10x best recorded honest value); "
             "refusing to publish a measurement artifact")

    vs_baseline = (frames_per_sec / ROUND1_ANCHOR) if ROUND1_ANCHOR else 1.0
    print(json.dumps({
        "metric": f"rasterise_fwd_bwd_{resolution}x{resolution}_b{batch}"
                  f"_f{segments * 8}",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
        # Max-min spread of the interleaved slope groups, as % of the
        # median: the round-over-round comparability signal under the
        # relay's documented 2763-3701 f/s load drift.
        "spread_pct": round(spread_pct, 1),
    }))


if __name__ == "__main__":
    main()
