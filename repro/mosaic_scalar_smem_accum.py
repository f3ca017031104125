"""Minimised repro: Mosaic miscompiles scalar-SMEM accumulation kernels.

Distilled from dirt_tpu's deleted round-1 face-major gradient kernel (git
history: dirt_tpu/ops/grad_pallas.py), which produced wrong vertex/colour
gradients when compiled on real TPU v5e while being exact in interpreter
mode.  Observed signatures on device (round 2, axon relay to v5e):

  * multi-chunk grids ("arbitrary" innermost dim): wrong values / NaN;
  * single-chunk multi-tile grids: wrong values, and DIFFERENT wrong values
    depending on whether an operand arrived as a jit argument or a closure
    constant (with constant-folding guards in place) -- i.e. the results
    depended on operand layout, the signature of a compiler bug rather than
    a semantics bug;
  * the same kernel in interpreter mode, and the restructured vector-
    accumulation kernels (ops/grad_dense.py), are exact on the same scenes.

The pattern this script isolates (the deleted kernel's structure):

    grid = (tiles, chunks) with dimension_semantics ("parallel", "arbitrary")
    out_ref : SMEM [CHUNK, D] block, zero-initialised via an aliased input
    fori_loop over j < n_live (dynamic bound from an SMEM scalar):
        out_ref[..., j, k] += jnp.sum(mask * vmem_plane)   # scalar += of a
                                                           # vector reduction

Run on a real TPU (from the repo root, TPU env untouched):

    python repro/mosaic_scalar_smem_accum.py

It computes the same reduction three ways -- compiled Pallas, interpreter
Pallas, plain jnp -- and reports PASS/FAIL per comparison.  On a correct
stack all three agree to f32 rounding; the historical failure mode is the
compiled run disagreeing wildly (or NaN) while interpret == jnp.

If this script passes on a newer toolchain, the underlying Mosaic bug is
fixed; the production kernels do not depend on this pattern any more
either way.
"""

import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H, TILE_W = 8, 128
CHUNK = 16
TILES = 4          # multi-tile: historically enough to trigger the bug
CHUNKS = 2         # multi-chunk: the round-2-early failure mode
D = 4              # accumulated scalars per row


def _kernel(count_ref, ids_ref, planes_ref, zeros_ref, out_ref):
    del zeros_ref  # aliased to out_ref: provides the zero initialisation
    chunk = pl.program_id(1)
    chunk_active = chunk * CHUNK < count_ref[0, 0, 0, 0]

    @pl.when(chunk_active)
    def _process():
        plane_a = planes_ref[0, 0]                     # [TILE_H, TILE_W]
        plane_b = planes_ref[0, 1]
        plane_id = planes_ref[0, 2]

        def visit(j, _):
            fid = ids_ref[0, 0, chunk * CHUNK + j]
            mask = plane_id == fid
            masked_a = jnp.where(mask, plane_a, 0.0)
            masked_b = jnp.where(mask, plane_b, 0.0)
            # Scalar SMEM accumulation of vector reductions: the pattern
            # Mosaic historically miscompiled.
            out_ref[0, 0, j, 0] += jnp.sum(masked_a)
            out_ref[0, 0, j, 1] += jnp.sum(masked_b)
            out_ref[0, 0, j, 2] += jnp.sum(masked_a * plane_b)
            out_ref[0, 0, j, 3] += -jnp.sum(masked_b * plane_a)
            return 0

        n_live = jnp.minimum(CHUNK, count_ref[0, 0, 0, 0] - chunk * CHUNK)
        jax.lax.fori_loop(0, n_live, visit, 0)


def run(interpret):
    rng = np.random.RandomState(0)
    num_ids = CHUNKS * CHUNK
    planes = rng.randn(TILES, 3, TILE_H, TILE_W).astype(np.float32)
    # Plane 2 holds per-pixel ids in [0, num_ids): each grid row's masks hit.
    planes[:, 2] = rng.randint(0, num_ids, size=(TILES, TILE_H, TILE_W))
    ids = np.tile(np.arange(num_ids, dtype=np.float32)[None, None],
                  (TILES, 1, 1))
    counts = np.full((TILES, 1, 1, 1), num_ids, np.int32)

    out = pl.pallas_call(
        _kernel,
        grid=(TILES, CHUNKS),
        in_specs=[
            pl.BlockSpec((1, 1, 1, 1), lambda t, c: (t, 0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, num_ids), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 3, TILE_H, TILE_W), lambda t, c: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, CHUNK, D), lambda t, c: (t, c, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, CHUNK, D), lambda t, c: (t, c, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((TILES, CHUNKS, CHUNK, D), jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(counts), jnp.asarray(ids), jnp.asarray(planes),
      jnp.zeros((TILES, CHUNKS, CHUNK, D), jnp.float32))
    return np.asarray(out), planes, ids


def reference(planes, ids):
    tiles, _, h, w = planes.shape
    num_ids = ids.shape[-1]
    out = np.zeros((tiles, CHUNKS, CHUNK, D), np.float32)
    for t in range(tiles):
        a, b, pid = planes[t]
        for row in range(num_ids):
            mask = pid == ids[t, 0, row]
            ma, mb = np.where(mask, a, 0), np.where(mask, b, 0)
            out[t, row // CHUNK, row % CHUNK] = [
                ma.sum(), mb.sum(), (ma * b).sum(), -(mb * a).sum()]
    return out


def main():
    on_cpu = jax.default_backend() == "cpu"
    got_i, planes, ids = run(interpret=True)
    want = reference(planes, ids)
    runs = [("interpret", got_i)]
    if on_cpu:
        print("(cpu backend: compiled Pallas unavailable; interpreter "
              "harness check only -- run on a TPU for the repro)")
    else:
        runs.insert(0, ("compiled", run(interpret=False)[0]))
    ok = True
    for name, got in runs:
        err = np.abs(got - want).max()
        good = np.isfinite(got).all() and err < 1e-3
        print(f"{name:9s} vs numpy: max err {err:.3e} "
              f"{'PASS' if good else 'FAIL  <-- miscompile'}")
        ok &= good
    print("RESULT:", "PASS (bug not present on this stack)" if ok
          else "FAIL (Mosaic scalar-SMEM accumulation miscompile)")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
