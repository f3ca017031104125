"""Gradient-quality A/B for the opt-in diagonal occluder dilation
(DIRT_TPU_DIAGONAL_DILATION, round-4 stretch; VERDICT r3 item 9).

The reference documents two dilation limitations in-code
(rasterise_grad_egl.cu:176-183): one-pixel-wide faces and diagonal
neighbours.  The opt-in adds four parity-dithered diagonal attempts after
the reference's two axial ones.  This measures whether that improves
gradient QUALITY on the cylinder scene (the reference's own gradient test
geometry, tests/rasterise_tests.py):

  1. FD agreement: analytic d(loss)/d(param) vs central finite differences
     at pixel-scale steps, for translation x/y and rotation.
  2. Inverse-rendering fit: gradient descent recovering translation +
     rotation from a target render; final loss after a fixed step budget.

CPU-runnable (the dilation decision logic is identical on all backends):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m sweeps._ab_dilation
"""
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/dirt_tpu_jax_cache_cpu')
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import dirt_tpu
from dirt_tpu import matrices
from dirt_tpu.ops import backward
from dirt_tpu.utils import meshes

H = W = 96


def render(params, verts_h, faces, colors, bg):
    view = matrices.compose(
        matrices.translation(
            jnp.concatenate([params[:2], jnp.asarray([-3.0])])),
        matrices.rodrigues(jnp.asarray([-0.4, 0., 0.])))
    model = matrices.rodrigues(jnp.stack(
        [params[2], params[3], jnp.float32(0.0)]))
    proj = matrices.perspective_projection(0.1, 20., 0.25, 1.)
    clip = verts_h @ model @ view @ proj
    return dirt_tpu.rasterise(bg, clip, colors, faces)


def scene(seed=0):
    rng = np.random.RandomState(seed)
    verts, faces = meshes.make_cylinder(0.5, 1.0, 0.1, 0.2, 12)
    verts_h = jnp.asarray(np.concatenate(
        [verts, np.ones((verts.shape[0], 1), np.float32)], 1))
    faces = jnp.asarray(faces)
    colors = jnp.asarray(
        rng.uniform(size=(verts.shape[0], 3)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    weights = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
    return verts_h, faces, colors, bg, weights


def fd_agreement(seed=0):
    """FD vs analytic on the SMOOTH fit loss near its minimum.

    The fit loss (mean-squared difference to a fixed target render) is a
    far better conditioned probe than a random-weighted pixel sum: near
    the target it is locally quadratic, both FD and the filter-based
    analytic gradient point downhill, and sign disagreement is a real
    quality failure rather than harness noise.
    """
    verts_h, faces, colors, bg, _ = scene(seed)
    target_p = jnp.asarray([0.12, -0.08, 0.45, 0.25], jnp.float32)
    target = render(target_p, verts_h, faces, colors, bg)

    def loss(params):
        d = render(params, verts_h, faces, colors, bg) - target
        return jnp.mean(d * d)

    p0 = target_p + jnp.asarray([0.05, -0.04, 0.12, -0.1], jnp.float32)
    g = np.asarray(jax.grad(loss)(p0))
    # Pixel-scale FD steps (the boundary gradients are filter-based: FD
    # must move edges by ~a pixel to see them).
    steps = {0: 0.05, 1: 0.05, 2: 0.08, 3: 0.08}
    errs = []
    for k, eps in steps.items():
        e = np.zeros(4, np.float32); e[k] = eps
        fd = (float(loss(p0 + e)) - float(loss(p0 - e))) / (2 * eps)
        rel = abs(g[k] - fd) / max(abs(fd), 1e-6)
        errs.append(rel)
        print(f"  param {k}: analytic {g[k]:10.5f}  FD {fd:10.5f}  "
              f"rel {rel:6.1%}", flush=True)
    return float(np.mean(errs))


def fit(seed=0):
    verts_h, faces, colors, bg, _ = scene(seed)
    target_p = jnp.asarray([0.12, -0.08, 0.45, 0.25], jnp.float32)
    target = render(target_p, verts_h, faces, colors, bg)

    def loss(params):
        d = render(params, verts_h, faces, colors, bg) - target
        return jnp.mean(d * d)

    # Sign-SGD with a decaying step: converges iff the gradient SIGNS are
    # right along the trajectory, which is exactly the quality question --
    # magnitudes of filter-based boundary gradients are scene-scaled and a
    # plain lr either stalls or overshoots (the 60-step plain-SGD variant
    # moved the loss <2%, insensitive to the dilation mode).
    vg = jax.jit(jax.value_and_grad(loss))
    p = jnp.zeros(4, jnp.float32)
    l0 = float(loss(p))
    for i in range(240):
        step = 0.04 * (0.5 ** (i / 60.0))
        _, g = vg(p)
        p = p - step * jnp.sign(g)
    lf = float(loss(p))
    perr = float(np.abs(np.asarray(p - target_p)).max())
    print(f"  fit: loss {l0:.5f} -> {lf:.6f}; max param err {perr:.4f}",
          flush=True)
    return lf, perr


if __name__ == "__main__":
    for seed in (0, 1):
        results = {}
        for diag in (False, True):
            backward.DIAGONAL = diag
            print(f"=== seed {seed}, diagonal dilation "
                  f"{'ON' if diag else 'OFF'} ===", flush=True)
            mean_rel = fd_agreement(seed)
            lf, perr = fit(seed)
            results[diag] = (mean_rel, lf, perr)
            print(f"  mean FD rel err {mean_rel:.1%}", flush=True)
        off, on = results[False], results[True]
        print(f"\nseed {seed} summary: FD rel err {off[0]:.1%} -> {on[0]:.1%}; "
              f"fit loss {off[1]:.6f} -> {on[1]:.6f}; "
              f"param err {off[2]:.4f} -> {on[2]:.4f}\n", flush=True)
