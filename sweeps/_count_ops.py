"""Counted ops-per-visit tables for the sweep algebra arms (CPU, no device).

Traces the ACTUAL per-visit expressions (forward_dense._chunk_candidates,
grad_dense._chunk_sums) to jaxprs (recursively flattening nested jit
calls) and tabulates their operations by output shape class:

  plane  [CHUNK, PIX]  -- full-width VPU work, the issue-bound cost
  reduce [CHUNK, PIX] -> [1, PIX] or [CHUNK, 1] cross-vector reductions
  row    [1, PIX]      -- per-pixel rows (1/CHUNK the vreg count)
  col    [CHUNK, 1]    -- per-face columns (lane-broadcast, cheap)

This is the measurement VERDICT r4 item 3 asked for: COVER_FAST proved the
fused sweeps are VPU-issue-bound (plane-op count tracks device time), so
the table quantifies each algebra arm before paying for a device A/B
(sweeps/_sweep_cover.py, sweeps/_sweep_fold.py).  Trace trap: jax caches
traces on the FUNCTION OBJECT, so each arm traces a freshly-defined
wrapper (a shared wrapper re-traced after flipping a module flag silently
returns the first arm's jaxpr).

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m sweeps._count_ops
"""
import jax
import jax.numpy as jnp

from dirt_tpu.ops import forward_dense, forward_pallas, grad_dense

CHUNK, PIX, C = 64, 4096, 3
_STRUCTURAL = ("broadcast_in_dim", "slice", "concatenate", "squeeze",
               "reshape", "convert_element_type", "transpose")


def _walk(jaxpr, counts, chunk, pix):
    for eqn in jaxpr.eqns:
        sub = eqn.params.get("jaxpr", None) or eqn.params.get(
            "call_jaxpr", None)
        if sub is not None:
            _walk(getattr(sub, "jaxpr", sub), counts, chunk, pix)
            continue
        if eqn.primitive.name in ("reduce_sum", "reduce_min", "reduce_max"):
            if eqn.invars[0].aval.shape == (chunk, pix):
                counts["reduce"] += 1
                continue
        if eqn.primitive.name in _STRUCTURAL:
            counts["structural"] += 1
            continue
        shapes = [v.aval.shape for v in eqn.outvars]
        s = shapes[0] if shapes else ()
        if s == (chunk, pix):
            counts["plane"] += 1
        elif s == (1, pix):
            counts["row"] += 1
        elif s == (chunk, 1):
            counts["col"] += 1
        else:
            counts["other"] += 1


def classify(jaxpr, chunk, pix):
    counts = {"plane": 0, "reduce": 0, "row": 0, "col": 0,
              "structural": 0, "other": 0}
    _walk(jaxpr, counts, chunk, pix)
    return counts


def fmt(counts):
    return (f"plane {counts['plane']:3d}  reduce {counts['reduce']:2d}  "
            f"row {counts['row']:2d}  col {counts['col']:2d}  "
            f"structural {counts['structural']:2d}  "
            f"other {counts['other']:2d}")


def forward_table():
    width_d = forward_pallas._BASE + 3 * C
    xg = jnp.zeros((1, PIX), jnp.float32)
    yg = jnp.zeros((1, PIX), jnp.float32)
    table = jnp.zeros((CHUNK, width_d), jnp.float32)

    print("forward _chunk_candidates (per visit):")
    for cover, fold in ((False, False), (True, False), (True, True)):
        forward_dense.COVER_FAST, forward_dense.FOLD = cover, fold

        def sweep(table, xg, yg, _tag=(cover, fold)):
            col = lambda i: table[:, i:i + 1]
            return forward_dense._chunk_candidates(col, xg, yg, C)[0]

        j = jax.make_jaxpr(sweep)(table, xg, yg)
        tag = ("spec      " if not cover else
               "cover_fast" if not fold else "fast+fold ")
        print(f"  {tag}: {fmt(classify(j.jaxpr, CHUNK, PIX))}", flush=True)
    forward_dense.COVER_FAST, forward_dense.FOLD = True, False


def grad_table():
    n_planes = 12 + C
    planes = jnp.zeros((n_planes, PIX), jnp.float32)
    table = jnp.zeros((CHUNK, 32), jnp.float32)

    print("gradient _chunk_sums (per visit):")
    for fold in (False, True):
        grad_dense.FOLD = fold

        def sums(table, planes, _tag=fold):
            col = lambda i: table[:, i:i + 1]
            plane = lambda i: planes[i:i + 1, :]
            return grad_dense._chunk_sums(col, plane, C)

        j = jax.make_jaxpr(sums)(table, planes)
        tag = "base" if not fold else "fold"
        print(f"  {tag}      : {fmt(classify(j.jaxpr, CHUNK, PIX))}",
              flush=True)
    grad_dense.FOLD = False


if __name__ == "__main__":
    forward_table()
    grad_table()
    print("done", flush=True)
