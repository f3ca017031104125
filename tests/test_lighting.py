"""Asserting unit tests for dirt_tpu.lighting (normals, splitting, shading)."""

import numpy as np
import jax.numpy as jnp

from dirt_tpu import lighting
from dirt_tpu.utils import meshes


def test_split_vertices_by_face():
    vertices = jnp.arange(12., dtype=jnp.float32).reshape(4, 3)
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    new_vertices, new_faces = lighting.split_vertices_by_face(vertices, faces)
    assert new_vertices.shape == (6, 3)
    assert new_faces.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(new_faces), [[0, 1, 2], [3, 4, 5]])
    np.testing.assert_array_equal(
        np.asarray(new_vertices),
        np.asarray(vertices)[[0, 1, 2, 0, 2, 3]])


def test_split_vertices_batched():
    vertices = jnp.ones((2, 4, 4))
    faces = jnp.array([[0, 1, 2]], jnp.int32)
    new_vertices, new_faces = lighting.split_vertices_by_face(vertices, faces)
    assert new_vertices.shape == (2, 3, 4)
    assert new_faces.shape == (1, 3)


def test_vertex_normals_pre_split_cube():
    vertices, faces = meshes.build_cube()
    vertices, faces = lighting.split_vertices_by_face(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32))
    normals = lighting.vertex_normals_pre_split(vertices, faces)
    normals = np.asarray(normals)
    # Every normal is a unit axis vector (cube faces are axis-aligned).
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1., atol=1e-5)
    np.testing.assert_allclose(np.abs(normals).max(axis=-1), 1., atol=1e-5)
    # Each normal is perpendicular to its face, i.e. aligned with the axis of
    # the corner coordinate (|n . v| = 1 for unit-axis normals on a centred
    # cube).  Note the reference cube's winding is not consistently outward;
    # its samples rely on double-sided lighting (samples/simple.py:63-66).
    dots = np.sum(normals * np.asarray(vertices), axis=-1)
    np.testing.assert_allclose(np.abs(dots), 1., atol=1e-5)


def test_vertex_normals_octahedron_corner_average():
    # A square pyramid apex: its normal is the renormalised average of the
    # unit normals of the four side faces, which by symmetry is +y.
    vertices = jnp.array([
        [0., 1., 0.],    # apex
        [1., 0., 0.], [0., 0., 1.], [-1., 0., 0.], [0., 0., -1.],
    ])
    faces = jnp.array([[0, 2, 1], [0, 3, 2], [0, 4, 3], [0, 1, 4]], jnp.int32)
    normals = lighting.vertex_normals(vertices, faces)
    np.testing.assert_allclose(np.asarray(normals[0]), [0., 1., 0.], atol=1e-5)


def test_vertex_normals_matches_pre_split_on_split_mesh():
    vertices, faces = meshes.build_cube()
    vertices, faces = lighting.split_vertices_by_face(
        jnp.asarray(vertices, jnp.float32), jnp.asarray(faces, jnp.int32))
    a = np.asarray(lighting.vertex_normals(vertices, faces))
    b = np.asarray(lighting.vertex_normals_pre_split(vertices, faces))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_vertex_normals_batched():
    vertices, faces = meshes.build_cube()
    vertices = jnp.tile(jnp.asarray(vertices, jnp.float32)[None], (3, 1, 1))
    normals = lighting.vertex_normals(vertices, jnp.asarray(faces, jnp.int32))
    assert normals.shape == (3, 8, 3)
    np.testing.assert_allclose(
        np.asarray(normals[0]), np.asarray(normals[2]), atol=1e-6)


def test_diffuse_directional():
    normals = jnp.array([[0., 0., 1.], [0., 0., -1.], [1., 0., 0.]])
    colors = jnp.ones((3, 3))
    light_dir = jnp.array([0., 0., -1.])  # travelling towards -z
    lit = lighting.diffuse_directional(
        normals, colors, light_dir, jnp.array([1., 1., 1.]),
        double_sided=False)
    lit = np.asarray(lit)
    np.testing.assert_allclose(lit[0], 1., atol=1e-6)   # facing the light
    np.testing.assert_allclose(lit[1], 0., atol=1e-6)   # facing away
    np.testing.assert_allclose(lit[2], 0., atol=1e-6)   # perpendicular
    lit2 = np.asarray(lighting.diffuse_directional(
        normals, colors, light_dir, jnp.array([1., 1., 1.]),
        double_sided=True))
    np.testing.assert_allclose(lit2[1], 1., atol=1e-6)  # back face lit


def test_diffuse_point_falls_off_with_angle():
    positions = jnp.array([[0., 0., 0.], [1., 0., 0.]])
    normals = jnp.array([[0., 1., 0.], [0., 1., 0.]])
    colors = jnp.ones((2, 1))
    light_pos = jnp.array([0., 1., 0.])
    lit = np.asarray(lighting.diffuse_point(
        positions, normals, colors, light_pos, jnp.array([1.])))
    assert lit[0, 0] > lit[1, 0] > 0.


def test_specular_directional_peak_at_mirror_angle():
    # Surface at origin, normal +z; light travels towards -z, so the
    # reflected direction is +z; a camera on +z sees the full highlight.
    positions = jnp.zeros((1, 3))
    normals = jnp.array([[0., 0., 1.]])
    refl = jnp.ones((1, 3))
    lit_on_axis = np.asarray(lighting.specular_directional(
        positions, normals, refl,
        light_direction=jnp.array([0., 0., -1.]),
        light_color=jnp.array([1., 1., 1.]),
        camera_position=jnp.array([0., 0., 10.]),
        shininess=jnp.asarray(8.), double_sided=False))
    lit_off_axis = np.asarray(lighting.specular_directional(
        positions, normals, refl,
        light_direction=jnp.array([0., 0., -1.]),
        light_color=jnp.array([1., 1., 1.]),
        camera_position=jnp.array([10., 0., 1.]),
        shininess=jnp.asarray(8.), double_sided=False))
    assert lit_on_axis[0, 0] > 0.99
    assert lit_off_axis[0, 0] < lit_on_axis[0, 0]
