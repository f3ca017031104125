"""Multi-chip data parallelism for batched rasterisation.

The reference's multi-device story is one GL context per GPU selected by
TF device placement (tests/multi_gpu_test.py:20-29, gl_dispatcher.h:27,
gl_common.h:55-67).  The TPU-native equivalent is a `jax.sharding.Mesh` whose
batch axis shards meshes across chips over ICI: rasterisation is
embarrassingly batch-parallel (each image's tiles live on one chip), and any
cross-chip reduction (e.g. gradients of scene parameters shared across the
batch) is an XLA collective (`psum`) emitted by shard_map/jit -- no custom
communication layer, matching SURVEY.md section 2.3's inventory (the
reference has no other parallelism axes: no TP/PP/SP/EP applies to a
single-op renderer).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import rasterise_ops

BATCH_AXIS = "batch"


def make_mesh(devices=None, axis_name=BATCH_AXIS):
    """A 1-D device mesh over the batch axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def rasterise_batch_sharded(mesh, background, vertices, vertex_colors, faces,
                            backend=None, axis_name=BATCH_AXIS):
    """Rasterises a batch sharded across the mesh's batch axis.

    All array arguments carry a leading batch dimension divisible by the mesh
    size.  Each chip rasterises its local shard with a private framebuffer
    (the analogue of the per-GPU GL contexts in the reference); no
    communication is needed in the forward pass, and gradient collectives are
    inserted automatically when this is differentiated under the same mesh.
    """
    spec = P(axis_name)

    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, so the VMA type check rejects any Pallas kernel under
    # shard_map.  Everything here is batch-sharded with no collectives in
    # the forward, so there is nothing for the check to catch; gradient
    # collectives (psum) are inserted by autodiff outside this wrapper.
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(spec, spec, spec, spec), out_specs=spec)
    def _render(bg, v, c, f):
        return rasterise_ops.rasterise_batch(bg, v, c, f, backend=backend)

    return _render(background, vertices, vertex_colors, faces)


def replicated(mesh, tree):
    """Places a pytree fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def batch_sharded(mesh, tree, axis_name=BATCH_AXIS):
    """Places a pytree with its leading axis sharded over the mesh."""
    def put(a):
        spec = P(axis_name, *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def data_parallel_fit_step(mesh, render_fn, params, targets, learning_rate,
                           axis_name=BATCH_AXIS):
    """One SGD step of inverse rendering, data-parallel over the mesh.

    `render_fn(params, shard_size) -> [shard, H, W, C]` renders the local
    shard from *replicated* scene parameters; `targets` is batch-sharded.
    The per-chip L2 loss is reduced with `psum` over ICI, so the parameter
    gradient is identical on every chip (replicated), exactly the pattern a
    DIRT-style analysis-by-synthesis fit uses at scale.

    Returns (new_params, loss).
    """
    num = mesh.devices.size
    shard = targets.shape[0] // num

    # check_vma=False: same reason as rasterise_batch_sharded -- render_fn
    # may run Pallas kernels, whose out_shapes carry no VMA annotation.
    # The psum over the batch axis below is explicit, not checker-inferred.
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(axis_name)), out_specs=(P(), P()))
    def _step(p, local_targets):
        def loss_fn(q):
            rendered = render_fn(q, shard)
            local = jnp.sum((rendered - local_targets) ** 2)
            return jax.lax.psum(local, axis_name) / targets.size
        loss, grads = jax.value_and_grad(loss_fn)(p)
        new_p = jax.tree.map(lambda a, g: a - learning_rate * g, p, grads)
        return new_p, loss

    return _step(params, targets)
