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
(sweeps/_sweep_cover.py, sweeps/_sweep_fold.py).  CAVEAT, learned from the
round-5 fold A/B: the plane-COUNT model holds within an op kind but not
across kinds -- the fold arms counted 4 (forward) / 5 (gradient) plane ops
cheaper yet LOST 2-5% on device, because float selects with broadcast
operands cost more than the boolean chains / broadcast-free muls they
replaced (BASELINE.md round-5 section; the fold arms were removed, so this
script now counts the surviving spec / COVER_FAST / production-gradient
trees).  Trace trap: jax caches traces on the FUNCTION OBJECT, so each arm
traces a freshly-defined wrapper (a shared wrapper re-traced after
flipping a module flag silently returns the first arm's jaxpr).

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
    for cover in (False, True):
        forward_dense.COVER_FAST = cover

        def sweep(table, xg, yg, _tag=cover):
            col = lambda i: table[:, i:i + 1]
            return forward_dense._chunk_candidates(col, xg, yg, C)[0]

        j = jax.make_jaxpr(sweep)(table, xg, yg)
        tag = "spec      " if not cover else "cover_fast"
        print(f"  {tag}: {fmt(classify(j.jaxpr, CHUNK, PIX))}", flush=True)
    forward_dense.COVER_FAST = True


def grad_table():
    n_planes = 12 + C
    planes = jnp.zeros((n_planes, PIX), jnp.float32)
    table = jnp.zeros((CHUNK, 32), jnp.float32)

    print("gradient _chunk_sums (per visit):")

    def sums(table, planes):
        col = lambda i: table[:, i:i + 1]
        plane = lambda i: planes[i:i + 1, :]
        return grad_dense._chunk_sums(col, plane, C)

    j = jax.make_jaxpr(sums)(table, planes)
    print(f"  base      : {fmt(classify(j.jaxpr, CHUNK, PIX))}", flush=True)


if __name__ == "__main__":
    forward_table()
    grad_table()
    print("done", flush=True)
