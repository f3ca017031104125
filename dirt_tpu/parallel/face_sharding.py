"""Face-parallel multi-chip rasterisation: shard the MESH, not the batch.

The reference's only cross-device mechanism is data-parallel placement
(tests/multi_gpu_test.py:20-29): every GPU rasterises whole images.  On a
TPU mesh a second axis is natural and strictly more capable -- shard the
FACE list across chips, let each chip rasterise its face subset into a
private framebuffer, and combine per pixel with the same lexicographic
(depth, face index) minimum the single-chip z-buffer uses.  The merge is
associative and commutative, so it maps onto two `pmin` collectives over
ICI (depth first, then the global face index among depth-sharers), and
the winning chip's shaded pixel / aux row is selected with a masked
`psum`.  This parallelises the O(faces x covered-pixels) sweep -- the
dominant cost at scale (BASELINE.md: 8192+ faces are sweep-bound) --
across chips, with O(pixels) combine traffic.

Gradients keep the exact filter-based semantics and shard along the same
face-keyed lines the production kernels already use: position rows mask
the post-dilation face plane and colour rows the pre-dilation one, so
ONE parts="all" blocks sweep per chip over its face subset -- against
the COMBINED aux with face ids remapped into its local range (foreign
winners get an unmatchable sentinel) -- computes that chip's share of
both halves, and the per-face rows meet in one `psum` each.  Scharr +
occluder dilation run on the combined image, so cross-chip occluder
adoption behaves exactly as unsharded; the pixel-keyed background
gradient is replicated-by-construction (no collective, no double
count).

Depth for the cross-chip compare is recomputed per winning pixel with the
spec expression (geometry.fragment_cover_depth, the same tree the
reference backend scans with), so the combine picks the unsharded winner
everywhere except sub-ulp cross-shard depth ties -- measure-zero on
generic scenes, the same caveat class as the recorded near-tie entries
(PARITY.md).

Numerical note: the FORWARD is exactly the unsharded image (winner
selection, shading and aux are bitwise; pinned in
tests/test_face_sharding.py).  GRADIENTS agree with the unsharded path
to +-1 ulp extra noise on the incoming cotangent: shard_map's
replicated-output transpose reduces 8 identical cotangent shards with a
sequential psum that rounds at odd multiples.  The position rows add the
established blocks-kernel-vs-XLA summation-order tolerance.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import backward as _backward
from ..ops import dispatch as _dispatch
from ..ops import geometry as _geometry
from ..ops import reference as _reference

FACE_AXIS = "faces"
# Sentinel face id: larger than any real global face index (the 2^24
# exact-f32 bound caps real ids far below), never equal to a local table
# id, and exactly representable in f32 for the kernels' face planes.
_FOREIGN = np.int32(2 ** 30)


def make_face_mesh(devices=None, axis_name=FACE_AXIS):
    """A 1-D device mesh over the face axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _winner_depth(vertices, faces_local, aux, height, width):
    """[B, H, W] depth of each pixel's local winner, +inf where uncovered.

    Uses the spec expression (geometry.fragment_cover_depth) on the
    winner's own face constants, evaluated at the pixel's centre -- the
    same tree reference.visibility_scan compares with, so cross-chip
    comparisons rank faces exactly as the unsharded scan does (up to
    sub-ulp kernel-vs-spec rounding at near-ties; module docstring).
    """
    x_ndc, y_ndc = _geometry.pixel_centre_ndc(height, width)

    def one(v, f, face_idx):
        setup = _geometry.face_setup(v, f)
        covered = face_idx >= 0
        safe = jnp.where(covered, face_idx, 0)
        _, depth = _geometry.fragment_cover_depth(
            setup.e[safe], setup.z[safe], setup.w[safe],
            setup.accept[safe], setup.valid[safe],
            x_ndc[None, :], y_ndc[:, None])
        return jnp.where(covered, depth, jnp.inf)

    return jax.vmap(one)(vertices, faces_local, aux.face_index)


def _forward_combine(background, vertices, vertex_colors, faces_local,
                     axis_name, backend):
    """Local rasterisation + cross-chip lexicographic winner combine.

    Returns (pixels, combined RasterAux with GLOBAL face ids)."""
    nloc = faces_local.shape[1]
    offset = jax.lax.axis_index(axis_name) * nloc
    height, width = background.shape[1], background.shape[2]

    # Local render over a zero background: covered pixels never read the
    # background, so the winner's shaded value is bitwise the unsharded
    # one; the real background composites after the combine.
    local_px, local_aux = _dispatch.forward_batch(
        jnp.zeros_like(background), vertices, vertex_colors, faces_local,
        backend)
    covered = local_aux.face_index >= 0
    depth = _winner_depth(vertices, faces_local, local_aux, height, width)

    gface = jnp.where(covered, local_aux.face_index + offset, _FOREIGN)
    dkey = jnp.where(covered, depth, jnp.inf)
    dmin = jax.lax.pmin(dkey, axis_name)
    # Ties (equal minimal depth on several chips) resolve by global face
    # index -- within a chip the local merge already used (depth, local
    # index), and contiguous sharding makes local order global order.
    cand = jnp.where(covered & (dkey == dmin), gface, _FOREIGN)
    fmin = jax.lax.pmin(cand, axis_name)
    win = covered & (gface == fmin)
    covered_any = fmin < _FOREIGN

    def combine(local, fill, extra_dims=0):
        m = win.reshape(win.shape + (1,) * extra_dims)
        summed = jax.lax.psum(
            jnp.where(m, local, jnp.zeros_like(local)), axis_name)
        ca = covered_any.reshape(covered_any.shape + (1,) * extra_dims)
        return jnp.where(ca, summed, fill)

    pixels = combine(local_px, background, 1)
    aux = _reference.RasterAux(
        face_index=combine(gface, jnp.int32(-1)),
        indices=combine(local_aux.indices, jnp.int32(-1), 1),
        barycentric=combine(local_aux.barycentric, jnp.float32(-1.0), 1),
        clip_w=combine(local_aux.clip_w, jnp.float32(jnp.inf)),
        dropped=jax.lax.psum(local_aux.dropped, axis_name),
    )
    return pixels, aux


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _face_sharded_core(background, vertices, vertex_colors, faces_local,
                       axis_name, backend):
    pixels, _ = _forward_combine(
        background, vertices, vertex_colors, faces_local, axis_name, backend)
    return pixels


def _face_sharded_fwd(background, vertices, vertex_colors, faces_local,
                      axis_name, backend):
    pixels, aux = _forward_combine(
        background, vertices, vertex_colors, faces_local, axis_name, backend)
    return pixels, (vertices, faces_local, pixels, aux)


def _face_sharded_bwd(axis_name, backend, residuals, grad_pixels):
    del backend
    vertices, faces_local, pixels, aux = residuals
    nloc = faces_local.shape[1]
    offset = jax.lax.axis_index(axis_name) * nloc

    # Both gradient halves are face-keyed in the production kernels
    # (position rows mask the post-dilation face plane, colour rows the
    # pre-dilation one), so ONE parts="all" blocks sweep per chip over its
    # face subset computes this chip's share of everything.  Remap the
    # combined (global) face ids into the local table range; foreign
    # winners keep covered semantics (their vertex triples, bary and
    # clip_w still drive Scharr/dilation and background masking) but carry
    # an id no local table row matches, so their rows accumulate on their
    # owning chip only and the psum is an exact disjoint union.  The
    # background gradient is pixel-keyed (covered-mask select of the
    # cotangent), identical on every chip -- no collective.
    covered = aux.face_index >= 0
    local_ids = aux.face_index - offset
    foreign = covered & ((local_ids < 0) | (local_ids >= nloc))
    face_local = jnp.where(
        covered, jnp.where(foreign, _FOREIGN, local_ids), -1)
    aux_local = aux._replace(face_index=face_local)
    grad_background, grad_vertices_local, grad_colors_local = (
        _backward.rasterise_grad_grouped(
            vertices, faces_local, pixels, grad_pixels, aux_local,
            parts="all", implementation="blocks"))
    grad_vertices = jax.lax.psum(grad_vertices_local, axis_name)
    grad_vertex_colors = jax.lax.psum(grad_colors_local, axis_name)

    return (grad_background, grad_vertices, grad_vertex_colors,
            np.zeros(faces_local.shape, dtype=jax.dtypes.float0))


_face_sharded_core.defvjp(_face_sharded_fwd, _face_sharded_bwd)


def rasterise_batch_face_sharded(mesh, background, vertices, vertex_colors,
                                 faces, backend=None, axis_name=FACE_AXIS,
                                 batch_axis=None):
    """Rasterises with the FACE list sharded across the mesh.

    Args are as rasterise_batch, with `faces` [batch, F, 3] sharded over
    `axis_name` (F divisible by that mesh axis; background/vertices/
    colors replicated over it).  Returns pixels differentiable wrt
    background, vertices and vertex_colors with the same filter-based
    gradient semantics as the single-chip path (position rows face-
    sharded + psum, colour rows replicated -- module docstring).

    `batch_axis` composes this with data parallelism on a 2-D mesh
    (Mesh(devices.reshape(b, f), (batch_axis, axis_name))): every array's
    leading batch dimension shards over `batch_axis` while faces shard
    over `axis_name` -- the combine collectives only ever name the face
    axis, so each batch-shard group runs an independent face-parallel
    render.
    """
    background = jnp.asarray(background, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    n = mesh.shape[axis_name]
    if faces.shape[1] % n:
        raise ValueError(
            f"face count {faces.shape[1]} not divisible by mesh axis "
            f"{axis_name} size {n}")
    b = batch_axis
    if b is not None and background.shape[0] % mesh.shape[b]:
        raise ValueError(
            f"batch {background.shape[0]} not divisible by mesh axis "
            f"{b} size {mesh.shape[b]}")

    # check_vma=False: Pallas out_shapes carry no varying-mesh-axes
    # annotation (see parallel/sharding.py); collectives here are explicit.
    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(b), P(b), P(b), P(b, axis_name)), out_specs=P(b))
    def _render(bg, v, c, f):
        return _face_sharded_core(bg, v, c, f, axis_name, backend)

    return _render(background, vertices, vertex_colors, faces)


def rasterise_batch_face_sharded_with_aux(mesh, background, vertices,
                                          vertex_colors, faces, backend=None,
                                          axis_name=FACE_AXIS):
    """Forward-only variant returning (pixels, combined RasterAux) with
    GLOBAL face ids; the diagnostic twin of rasterise_batch_with_aux
    (aux.dropped sums the per-chip schedules' counts)."""
    background = jnp.asarray(background, jnp.float32)
    vertices = jnp.asarray(vertices, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)

    @functools.partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(), P(), P(None, axis_name)),
        out_specs=(P(), P()))
    def _render(bg, v, c, f):
        return _forward_combine(bg, v, c, f, axis_name, backend)

    return _render(background, vertices, vertex_colors, faces)
