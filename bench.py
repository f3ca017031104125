"""Benchmark: batched 256x256 rasterisation, forward + backward, per chip.

The headline metric from BASELINE.json: frames/sec/chip for batched 256^2
rasterise fwd+bwd on a Gouraud-shaded mesh.  The reference publishes no
numbers (BASELINE.md), so this harness *establishes* the baseline; the value
recorded by the driver in BENCH_r{N}.json tracks round-over-round progress.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "frames/sec/chip", "vs_baseline": N}

Environment knobs:
  DIRT_BENCH_BATCH / DIRT_BENCH_RES / DIRT_BENCH_SEGMENTS / DIRT_BENCH_ITERS
  DIRT_BENCH_BACKEND (default: auto -> pallas on TPU)
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

import dirt_tpu
from dirt_tpu import matrices
from dirt_tpu.utils import meshes

# Throughput of a V100 running the reference at this config is the north-star
# comparison (BASELINE.json); no published number exists, so vs_baseline is
# reported against this locally-measured round-1 anchor once recorded.
ROUND1_ANCHOR = 520.9  # frames/sec/chip measured in round 1 (TPU v5e)


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


def main():
    batch = int(os.environ.get("DIRT_BENCH_BATCH", "16"))
    resolution = int(os.environ.get("DIRT_BENCH_RES", "256"))
    segments = int(os.environ.get("DIRT_BENCH_SEGMENTS", "64"))
    iters = int(os.environ.get("DIRT_BENCH_ITERS", "20"))
    backend = os.environ.get("DIRT_BENCH_BACKEND") or None

    background, clip, colors, faces, weights = build_scene(
        batch, resolution, segments)

    if os.environ.get("DIRT_BENCH_VERIFY"):
        # Parity gate before timing: the first image must match the native
        # C++ oracle's visibility exactly and pixels within FMA tolerance.
        import numpy as _np
        from dirt_tpu.ops import dispatch as _dispatch
        from dirt_tpu.utils import oracle as _oracle
        want_pixels, want_index = _oracle.rasterise(
            _np.asarray(background[0]), _np.asarray(clip[0]),
            _np.asarray(colors[0]), _np.asarray(faces[0]))
        # Gate BOTH execution paths: eager (op-by-op) and compiled (the
        # shape the timed loop runs).  Compiled-graph corruption through
        # the remote-compile path has been observed with exact visibility
        # and wrong pixels, which an eager-only gate cannot catch.
        for tag, fwd in (
                ("eager", _dispatch.forward_batch),
                ("jitted", jax.jit(_dispatch.forward_batch))):
            pixels, aux = fwd(
                background[:1], clip[:1], colors[:1], faces[:1])
            assert (_np.asarray(aux.face_index[0]) == want_index).all(), \
                f"visibility parity failure vs native oracle ({tag})"
            _np.testing.assert_allclose(
                _np.asarray(pixels[0]), want_pixels, atol=1e-4, rtol=1e-5,
                err_msg=f"pixel parity failure vs native oracle ({tag})")
        print("# parity vs native oracle: OK (eager + jitted)", flush=True)

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

    def timed(fn, nonce):
        jax.block_until_ready(fn(clip, *scene))   # warm up / compile
        # Fresh input per call (a remote-execution relay may cache identical
        # (executable, input) pairs); min over repeats tames dispatch jitter.
        times = []
        for k in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(clip + nonce * (k + 1), *scene))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_short = timed(short, 1e-6)
    t_long = timed(long_, 2e-6)
    per_step = max((t_long - t_short) / (2 * iters), 1e-9)
    frames_per_sec = batch / per_step
    vs_baseline = (frames_per_sec / ROUND1_ANCHOR) if ROUND1_ANCHOR else 1.0
    print(json.dumps({
        "metric": f"rasterise_fwd_bwd_{resolution}x{resolution}_b{batch}"
                  f"_f{segments * 8}",
        "value": round(frames_per_sec, 2),
        "unit": "frames/sec/chip",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
