"""Pixel-exact square test: the reference's only automated check.

Renders a 16px axis-aligned white square and asserts *exact* equality against
an analytic pixel-coverage formula (pixel centres at +0.5), reproducing
/root/reference/tests/square_test.py:11-57 as an asserting pytest.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dirt_tpu

CANVAS_WIDTH, CANVAS_HEIGHT = 128, 128
CENTRE_X, CENTRE_Y = 32, 64
SQUARE_SIZE = 16


def analytic_pixels():
    xs, ys = np.meshgrid(np.arange(CANVAS_WIDTH), np.arange(CANVAS_HEIGHT))
    xs = xs.astype(np.float32) + 0.5
    ys = ys.astype(np.float32) + 0.5
    x_in = np.abs(xs - CENTRE_X) <= SQUARE_SIZE / 2
    y_in = np.abs(ys - CENTRE_Y) <= SQUARE_SIZE / 2
    return (x_in & y_in).astype(np.float32)


def square_scene():
    square_vertices = np.array(
        [[0, 0], [0, 1], [1, 1], [1, 0]], np.float32) * SQUARE_SIZE - SQUARE_SIZE / 2.
    square_vertices += [CENTRE_X, CENTRE_Y]
    square_vertices = square_vertices * 2. / [CANVAS_WIDTH, CANVAS_HEIGHT] - 1.
    square_vertices = np.concatenate(
        [square_vertices, np.zeros([4, 1], np.float32), np.ones([4, 1], np.float32)],
        axis=1)
    return square_vertices, np.array([[0, 1, 2], [0, 2, 3]], np.int32)


@pytest.mark.parametrize("backend", ["reference", "pallas", "dense", "blocks"])
def test_square_pixels_exact(backend):
    vertices, faces = square_scene()
    pixels = dirt_tpu.rasterise(
        vertices=vertices,
        faces=faces,
        vertex_colors=jnp.ones([4, 1]),
        background=jnp.zeros([CANVAS_HEIGHT, CANVAS_WIDTH, 1]),
        height=CANVAS_HEIGHT, width=CANVAS_WIDTH, channels=1,
        backend=backend,
    )[:, :, 0]
    expected = analytic_pixels()
    got = np.asarray(pixels)
    disagreements = int(np.sum(expected != got))
    assert disagreements == 0, f"{disagreements} pixels disagree"
