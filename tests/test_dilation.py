"""Direct unit tests of the occluder-dilation step and channel grouping."""

import numpy as np
import jax.numpy as jnp

from dirt_tpu.ops import backward, dispatch
from dirt_tpu.utils import meshes

H, W = 32, 32


def _occlusion_aux():
    # Small near square (clip w = 1) over a huge far backdrop (clip w = 2).
    front = np.array([
        [-0.4, -0.4, 0., 1.], [-0.4, 0.4, 0., 1.],
        [0.4, 0.4, 0., 1.], [0.4, -0.4, 0., 1.]], np.float32)
    back = np.array([
        [-4., -4., 1., 2.], [-4., 4., 1., 2.],
        [4., 4., 1., 2.], [4., -4., 1., 2.]], np.float32)
    vertices = jnp.asarray(np.concatenate([front, back]))
    faces = jnp.asarray(
        np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32))
    colors = jnp.asarray(np.array(
        [[1., 0., 0.]] * 4 + [[0., 1., 0.]] * 4, np.float32))
    pixels, aux = dispatch.forward_batch(
        jnp.zeros((1, H, W, 3)), vertices[None], colors[None], faces[None])
    return pixels[0], aux, vertices


def test_dilation_adopts_occluder_at_boundary():
    pixels, aux, _ = _occlusion_aux()
    scharr_x, scharr_y = backward.scharr_filters(pixels)
    indices = aux.indices[0]
    idx_d, bary_d, w_d, dilated = backward._dilate(
        indices, aux.barycentric[0], aux.clip_w[0], scharr_x, scharr_y)

    indices = np.asarray(indices)
    idx_d = np.asarray(idx_d)
    w_d = np.asarray(w_d)
    dilated = np.asarray(dilated)

    front_cols = np.where(indices[H // 2, :, 0] < 4)[0]
    left_edge = front_cols.min()
    # The backdrop pixel immediately left of the front square must adopt the
    # front square's vertex-index triple and clip-w after dilation
    # (boundary gradients flow to the occluder, rasterise_grad_egl.cu:165-171).
    assert indices[H // 2, left_edge - 1, 0] >= 4        # pre: backdrop
    assert dilated[H // 2, left_edge - 1]
    assert idx_d[H // 2, left_edge - 1, 0] < 4           # post: occluder
    assert w_d[H // 2, left_edge - 1] == 1.0

    # Interior pixels of the front square are never dilated (same triple,
    # equal depth in every direction).
    assert not dilated[H // 2, left_edge + 3: left_edge + 6].any()


def test_diagonal_dilation_adopts_occluder_at_corner():
    # At the front square's corner, the diagonally-outside backdrop pixel
    # has NO axial neighbour over the occluder -- the reference documents
    # this as an unhandled limitation (rasterise_grad_egl.cu:176-183) and
    # the default (parity) mode must leave it un-dilated.  The opt-in
    # DIRT_TPU_DIAGONAL_DILATION mode must adopt the occluder there.
    pixels, aux, _ = _occlusion_aux()
    scharr_x, scharr_y = backward.scharr_filters(pixels)
    indices = aux.indices[0]

    front = np.asarray(indices[..., 0]) < 4
    rows, cols = np.where(front)
    r0, c0 = rows.min(), cols[rows == rows.min()].min()
    assert front[r0, c0] and not front[r0 - 1, c0] and not front[r0, c0 - 1]

    saved = backward.DIAGONAL
    try:
        backward.DIAGONAL = False
        *_, dil_off = backward._dilate(
            indices, aux.barycentric[0], aux.clip_w[0], scharr_x, scharr_y)
        backward.DIAGONAL = True
        idx_on, _, w_on, dil_on = backward._dilate(
            indices, aux.barycentric[0], aux.clip_w[0], scharr_x, scharr_y)
    finally:
        backward.DIAGONAL = saved

    assert not np.asarray(dil_off)[r0 - 1, c0 - 1]
    assert np.asarray(dil_on)[r0 - 1, c0 - 1]
    assert np.asarray(idx_on)[r0 - 1, c0 - 1, 0] < 4   # adopted the occluder
    assert np.asarray(w_on)[r0 - 1, c0 - 1] == 1.0
    # Diagonal mode only ADDS adoptions: every axially-dilated pixel stays.
    assert (np.asarray(dil_off) <= np.asarray(dil_on)).all()


def test_dilation_never_fires_without_depth_difference():
    # Coplanar same-w squares: the strict clip_w comparison
    # (rasterise_grad_egl.cu:165) must keep dilation off everywhere.
    verts, faces, front, back = meshes.two_squares(
        front_depth=0.0, back_depth=0.0, size=0.6, back_size=0.6)
    colors = np.zeros((8, 3), np.float32)
    colors[front] = 1.
    pixels, aux = dispatch.forward_batch(
        jnp.zeros((1, H, W, 3)), jnp.asarray(verts)[None],
        jnp.asarray(colors)[None], jnp.asarray(faces)[None])
    scharr_x, scharr_y = backward.scharr_filters(pixels[0])
    *_, dilated = backward._dilate(
        aux.indices[0], aux.barycentric[0], aux.clip_w[0], scharr_x, scharr_y)
    # Background pixels adjacent to the square DO dilate (their clip_w is
    # +inf, rasterise_grad_egl.cpp:442), but covered pixels all share
    # clip_w == 1 so the strict comparison keeps them un-dilated.
    covered = np.asarray(aux.indices[0, ..., 0]) >= 0
    assert not (np.asarray(dilated) & covered).any()
    assert (np.asarray(dilated) & ~covered).any()


def test_channel_grouping_matches_manual_composition():
    # C=5 gradients must equal 3+1+1 group-wise runs with grad_vertices
    # summed (dirt/rasterise_ops.py:145-163 semantics).
    rng = np.random.RandomState(0)
    verts, faces, front, back = meshes.two_squares()
    vertices = jnp.asarray(verts)[None]
    faces_b = jnp.asarray(faces)[None]
    colors = jnp.asarray(rng.uniform(size=(1, 8, 5)).astype(np.float32))
    bg = jnp.asarray(rng.uniform(size=(1, H, W, 5)).astype(np.float32))
    pixels, aux = dispatch.forward_batch(bg, vertices, colors, faces_b)
    grad_pixels = jnp.asarray(rng.randn(1, H, W, 5).astype(np.float32))

    gb, gv, gc = backward.rasterise_grad_grouped(
        vertices, faces_b, pixels, grad_pixels, aux)

    manual_gv = None
    manual_gb, manual_gc = [], []
    for begin, end in [(0, 3), (3, 4), (4, 5)]:
        grads = backward.rasterise_grad_batch(
            vertices, faces_b, pixels[..., begin:end],
            grad_pixels[..., begin:end], aux)
        manual_gb.append(np.asarray(grads.grad_background))
        manual_gc.append(np.asarray(grads.grad_vertex_colors))
        manual_gv = (np.asarray(grads.grad_vertices) if manual_gv is None
                     else manual_gv + np.asarray(grads.grad_vertices))

    np.testing.assert_array_equal(np.asarray(gv), manual_gv)
    np.testing.assert_array_equal(
        np.asarray(gb), np.concatenate(manual_gb, axis=-1))
    np.testing.assert_array_equal(
        np.asarray(gc), np.concatenate(manual_gc, axis=-1))


def test_rasterise_grad_debug_marks_dilated_pixels():
    # Public debug surface (the reference grad op's debug_thingy image).
    import dirt_tpu
    front = np.array([
        [-0.4, -0.4, 0., 1.], [-0.4, 0.4, 0., 1.],
        [0.4, 0.4, 0., 1.], [0.4, -0.4, 0., 1.]], np.float32)
    back = np.array([
        [-4., -4., 1., 2.], [-4., 4., 1., 2.],
        [4., 4., 1., 2.], [4., -4., 1., 2.]], np.float32)
    vertices = np.concatenate([front, back])
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    colors = np.array([[1., 0., 0.]] * 4 + [[0., 1., 0.]] * 4, np.float32)
    rng = np.random.RandomState(2)
    grad_pixels = rng.randn(H, W, 3).astype(np.float32)
    grads, debug = dirt_tpu.rasterise_grad_debug(
        jnp.zeros((H, W, 3)), vertices, colors, faces,
        jnp.asarray(grad_pixels))
    debug = np.asarray(debug)
    assert debug.shape == (H, W, 3)
    # Channel 0: dilation marker (1e-2 where dilated, 0 elsewhere).
    assert (debug[..., 0] > 0).any(), "no dilation marked at a boundary"
    assert set(np.unique(debug[..., 0])) <= {0.0, np.float32(1e-2)}
    # Channels 1-2: echo of the incoming grad channels 1-2
    # (rasterise_grad_egl.cu:150-151).
    np.testing.assert_array_equal(debug[..., 1], grad_pixels[..., 1])
    np.testing.assert_array_equal(debug[..., 2], grad_pixels[..., 2])
    assert grads.grad_vertices.shape == (8, 4)
