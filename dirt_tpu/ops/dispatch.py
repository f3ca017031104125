"""Backend dispatch for the forward rasteriser.

Backends:
  * "dense":     dense single-pass Pallas TPU kernel (ops/forward_dense.py),
                 whole face chunks as vector planes; the production path.
  * "blocks":    block-binned dense kernel (ops/forward_blocks.py): same
                 kernel math, O(faces) shared face table + per-tile block-id
                 lists via scalar prefetch; the large-mesh production path.
  * "pallas":    per-face tile-binned Pallas TPU kernel
                 (ops/forward_pallas.py); runs in interpreter mode
                 automatically off-TPU so tests exercise the kernel on CPU.
  * "reference": brute-force XLA scan (ops/reference.py), the oracle.
  * None/"auto": on TPU, the block-binned kernel at every size (its
                 fused-CSR schedule beat the dense kernel at every measured
                 mesh size in the round-3 sweep); DIRT_TPU_BLOCKS_THRESHOLD
                 can restore dense below a face count.  Reference elsewhere
                 (fast for CPU tests).

Selection can be forced globally with the DIRT_TPU_BACKEND environment
variable.  All backends implement the fragment semantics of ops/geometry.py:
winning-face maps match bit-exactly on tie-free scenes, interpolated values
to FMA-contraction rounding (the fused kernels shade in-kernel; the
reference backend shades via ops/reference.shade_pixels).
"""

import os

import jax
import jax.numpy as jnp

from . import reference


def on_accelerator():
    """True when the default jax backend is a TPU (including the 'axon'
    relay platform, whose backend name is not literally 'tpu').

    Deliberately NOT `!= "cpu"`: on a GPU-backed jax the TPU Pallas kernels
    (SMEM block specs, Mosaic compiler params) would be selected and fail to
    compile, so non-TPU accelerators fall back to the reference backend.
    """
    backend = jax.default_backend()
    if backend in ("tpu", "axon"):
        return True
    # Relay/proxy platforms wrap a TPU but report a custom name; check the
    # device kind rather than hard-coding every alias.
    try:
        kind = jax.devices()[0].device_kind.lower()
    except (IndexError, RuntimeError):
        return False
    return "tpu" in kind


def guard_constants(*arrays):
    """Couples compile-time-constant inputs to a tracer so XLA cannot
    constant-fold computations derived from them.

    Scene arrays that enter a jitted computation as closure constants are
    eligible for XLA constant folding.  Through the axon remote-compile
    relay, folded products were observed to arrive CORRUPTED on device
    (measured round 2: the folded corner-attribute gather zeroes every
    channel >= 1 -- forward pixels wrong by up to 0.98 with bit-exact aux;
    folded gradient plane tables arrived as garbage, sending the face-major
    gradient kernel to NaN).

    A per-leaf `optimization_barrier(const)` does NOT protect: applied to a
    concrete (non-tracer) array it executes eagerly at trace time and yields
    another concrete array, so no barrier ever enters the jaxpr and the
    constant folds anyway (verified on device).  The working guard runs ONE
    `optimization_barrier` over all leaves jointly; if any leaf is a tracer
    the barrier is a traced op and every constant leaf comes back as a
    tracer bound to it -- unfoldable by construction.

    When every leaf is concrete (fully-eager call) the inputs are returned
    untouched: trace-time operations on concrete arrays execute through the
    normal eager path on device (correct), and embedding the *results* as
    literals is exact (only compile-time folding through the relay
    corrupts).
    """
    leaves, treedef = jax.tree.flatten(tuple(arrays))
    if not any(isinstance(leaf, jax.core.Tracer) for leaf in leaves):
        return arrays
    # NO all-tracer fast path: an attempt to skip the barrier when every
    # leaf is already a tracer (it "cannot fold") regressed device parity
    # -- the recorded sweep produced exact winner maps with pixels wrong by
    # ~0.99 at every config, the corner-attribute corruption signature,
    # even though the dispatch-level guard had already barriered the same
    # values.  The barrier at EVERY op boundary is load-bearing against the
    # remote-compile path's folding behaviour, redundant-looking or not;
    # it also measured free (1242.7 vs 1242.1 f/s with/without).
    guarded = jax.lax.optimization_barrier(tuple(leaves))
    return jax.tree.unflatten(treedef, list(guarded))


def default_backend(num_faces=None):
    env = os.environ.get("DIRT_TPU_BACKEND", "auto")
    if env != "auto":
        return env
    if not on_accelerator():
        return "reference"
    # The block-binned kernel's fused-CSR schedule is the production TPU
    # forward at EVERY mesh size (round-3 v5e sweep at 16x256^2: 2.70 ms
    # vs the dense kernel's 3.98 at 512 faces; 7.96 vs ~13 at 2048; its
    # O(faces) tables also dominate past 4096 faces where the dense
    # per-tile packing's O(tiles x faces) gathers blow up).  Bit-exact
    # winner maps vs the other backends on tie-free scenes.  A non-zero
    # DIRT_TPU_BLOCKS_THRESHOLD restores the dense single-pass kernel for
    # meshes at or below that face count.
    threshold = int(os.environ.get("DIRT_TPU_BLOCKS_THRESHOLD", "0"))
    if num_faces is not None and num_faces <= threshold:
        return "dense"
    return "blocks"


def forward_batch(background, vertices, vertex_colors, faces, backend=None):
    """Rasterises a batch; returns (pixels [B,H,W,C], RasterAux [B,...])."""
    background = jnp.asarray(background, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    if background.ndim != 4:
        raise ValueError(f"background must be [B,H,W,C], got {background.shape}")
    if vertices.ndim != 3 or vertices.shape[-1] != 4:
        raise ValueError(f"vertices must be [B,V,4], got {vertices.shape}")
    if faces.ndim != 3 or faces.shape[-1] != 3:
        raise ValueError(f"faces must be [B,F,3], got {faces.shape}")
    if vertex_colors.shape[:2] != vertices.shape[:2]:
        raise ValueError(
            f"vertex_colors {vertex_colors.shape} does not match vertices "
            f"{vertices.shape}")
    if vertex_colors.shape[-1] != background.shape[-1]:
        raise ValueError(
            f"channel mismatch: vertex_colors {vertex_colors.shape} vs "
            f"background {background.shape}")

    background, vertices, vertex_colors, faces = guard_constants(
        background, vertices, vertex_colors, faces)

    chosen = backend or default_backend(num_faces=faces.shape[1])
    if chosen == "reference":
        return reference.rasterise_batch(
            background, vertices, vertex_colors, faces)
    if chosen == "pallas":
        from . import forward_pallas
        return forward_pallas.rasterise_batch(
            background, vertices, vertex_colors, faces)
    if chosen == "dense":
        from . import forward_dense
        return forward_dense.rasterise_batch(
            background, vertices, vertex_colors, faces)
    if chosen == "blocks":
        from . import forward_blocks
        return forward_blocks.rasterise_batch(
            background, vertices, vertex_colors, faces)
    raise ValueError(f"unknown backend {chosen!r}")
