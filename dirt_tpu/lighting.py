"""Mesh utilities and shading models (TPU-native, jax.numpy).

API parity with the reference ``dirt/lighting.py``.  The SparseTensor scatter
used by the reference's ``vertex_normals`` (dirt/lighting.py:74-88) is replaced
by a dense ``segment_sum``, which is the idiomatic XLA/TPU formulation.
"""

import jax
import jax.numpy as jnp


def _prepare_vertices_and_faces(vertices, faces):
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces)
    if faces.dtype != jnp.int32:
        faces = faces.astype(jnp.int32)
    return vertices, faces


def _get_face_normals(vertices, faces):
    # vertices: [*, V, 3]; faces: [F, 3].  Returns unit normals [*, F, 3].
    # Reference: dirt/lighting.py:24-31 (note: face normals are normalised
    # before averaging, so the average is NOT area-weighted).
    vertices_by_face = jnp.take(vertices, faces, axis=-2)  # [*, F, 3(corner), 3(xyz)]
    normals_by_face = jnp.cross(
        vertices_by_face[..., 1, :] - vertices_by_face[..., 0, :],
        vertices_by_face[..., 2, :] - vertices_by_face[..., 0, :],
    )  # [*, F, 3]
    normals_by_face = normals_by_face / (
        jnp.linalg.norm(normals_by_face, axis=-1, keepdims=True) + 1.e-12)
    return normals_by_face


def vertex_normals(vertices, faces):
    """Computes vertex normals for the given meshes.

    For each vertex, returns the renormalised average of the unit normals of
    all faces that include that vertex.

    Args:
        vertices: array of shape [*, V, 3] or [*, V, 4] (w is dropped).
        faces: int array of shape [F, 3].

    Returns:
        array of shape [*, V, 3].

    Reference: dirt/lighting.py:34-93.
    """
    vertices, faces = _prepare_vertices_and_faces(vertices, faces)
    vertices = vertices[..., :3]
    vertex_count = vertices.shape[-2]

    normals_by_face = _get_face_normals(vertices, faces)  # [*, F, 3]
    # Each face contributes its unit normal to its three corners.
    corner_normals = jnp.repeat(normals_by_face, 3, axis=-2)  # [*, F*3, 3]
    corner_vertex_ids = jnp.reshape(faces, [-1])  # [F*3]

    if corner_normals.ndim == 2:
        summed = jax.ops.segment_sum(
            corner_normals, corner_vertex_ids, vertex_count)
    else:
        summed = _batched_segment_sum(
            corner_normals, corner_vertex_ids, vertex_count)
    renormalised = summed / (
        jnp.linalg.norm(summed, axis=-1, keepdims=True) + 1.e-12)
    return renormalised


def _batched_segment_sum(data, segment_ids, num_segments):
    # data: [*, N, C]; segment over axis -2.
    flat = jnp.reshape(data, (-1,) + data.shape[-2:])  # [P, N, C]
    out = jax.vmap(
        lambda d: jax.ops.segment_sum(d, segment_ids, num_segments))(flat)
    return jnp.reshape(out, data.shape[:-2] + out.shape[-2:])


def vertex_normals_pre_split(vertices, faces, static=False):
    """Computes vertex normals for pre-split meshes.

    Identical to ``vertex_normals`` but assumes each vertex is used by exactly
    one face (e.g. after ``split_vertices_by_face``): each vertex simply takes
    its face's unit normal.  Vertices referenced by no face get zeros.

    Reference: dirt/lighting.py:101-133.  The ``static`` flag is accepted for
    API parity; jax shapes are always static so it has no effect.
    """
    del static
    vertices, faces = _prepare_vertices_and_faces(vertices, faces)
    vertices = vertices[..., :3]
    vertex_count = vertices.shape[-2]

    normals_by_face = _get_face_normals(vertices, faces)  # [*, F, 3]
    corner_normals = jnp.repeat(normals_by_face, 3, axis=-2)  # [*, F*3, 3]
    corner_vertex_ids = jnp.reshape(faces, [-1])
    if corner_normals.ndim == 2:
        return jnp.zeros((vertex_count, 3), corner_normals.dtype).at[
            corner_vertex_ids].set(corner_normals)
    flat = jnp.reshape(corner_normals, (-1,) + corner_normals.shape[-2:])
    out = jax.vmap(
        lambda n: jnp.zeros((vertex_count, 3), n.dtype).at[
            corner_vertex_ids].set(n))(flat)
    return jnp.reshape(out, corner_normals.shape[:-2] + (vertex_count, 3))


def split_vertices_by_face(vertices, faces):
    """Returns an equivalent mesh where each vertex is used by exactly one face.

    Args:
        vertices: array of shape [*, V, 3] or [*, V, 4].
        faces: int array of shape [F, 3].

    Returns:
        (new_vertices, new_faces) with shapes [*, F*3, C] and [F, 3].

    Reference: dirt/lighting.py:136-179.
    """
    vertices, faces = _prepare_vertices_and_faces(vertices, faces)
    face_count = faces.shape[0]
    new_vertices = jnp.take(vertices, jnp.reshape(faces, [-1]), axis=-2)
    new_faces = jnp.reshape(jnp.arange(face_count * 3, dtype=jnp.int32), [-1, 3])
    return new_vertices, new_faces


def diffuse_directional(vertex_normals, vertex_colors, light_direction,
                        light_color, double_sided=True):
    """Lambertian reflectance under a single directional light.

    Args:
        vertex_normals: [*, V, 3], assumed normalised.
        vertex_colors: [*, V, C] albedo.
        light_direction: [*, 3], assumed normalised (direction the light travels).
        light_color: [*, C].
        double_sided: if true, back faces are shaded like front faces.

    Returns:
        [*, V, C] reflectance.

    Reference: dirt/lighting.py:182-225.
    """
    vertex_normals = jnp.asarray(vertex_normals, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    light_direction = jnp.asarray(light_direction, jnp.float32)
    light_color = jnp.asarray(light_color, jnp.float32)

    cosines = jnp.matmul(vertex_normals, -light_direction[..., None])  # [*, V, 1]
    cosines = jnp.abs(cosines) if double_sided else jnp.maximum(cosines, 0.)
    return light_color[..., None, :] * vertex_colors * cosines


def specular_directional(vertex_positions, vertex_normals, vertex_reflectivities,
                         light_direction, light_color, camera_position,
                         shininess, double_sided=True):
    """Phong specular reflectance under a single directional light.

    Args:
        vertex_positions: [*, V, 3].
        vertex_normals: [*, V, 3], assumed normalised.
        vertex_reflectivities: [*, V, C].
        light_direction: [*, 3], assumed normalised.
        light_color: [*, C].
        camera_position: [*, 3].
        shininess: [*] specular exponent.
        double_sided: if true, back faces are shaded like front faces.

    Returns:
        [*, V, C] reflectance.

    Reference: dirt/lighting.py:228-288 (including its exact stabiliser
    placement: 1e-12 is added to the *normalised* view direction).
    """
    vertex_positions = jnp.asarray(vertex_positions, jnp.float32)
    vertex_normals = jnp.asarray(vertex_normals, jnp.float32)
    vertex_reflectivities = jnp.asarray(vertex_reflectivities, jnp.float32)
    light_direction = jnp.asarray(light_direction, jnp.float32)
    light_color = jnp.asarray(light_color, jnp.float32)
    camera_position = jnp.asarray(camera_position, jnp.float32)
    shininess = jnp.asarray(shininess, jnp.float32)

    vertices_to_light_direction = -light_direction
    reflected_directions = (
        -vertices_to_light_direction[..., None, :]
        + 2. * jnp.matmul(vertex_normals,
                          vertices_to_light_direction[..., None])
        * vertex_normals
    )  # [*, V, 3]
    vertex_to_camera = camera_position[..., None, :] - vertex_positions
    cosines = jnp.sum(
        (vertex_to_camera
         / jnp.linalg.norm(vertex_to_camera, axis=-1, keepdims=True) + 1.e-12)
        * reflected_directions,
        axis=-1, keepdims=True)
    cosines = jnp.abs(cosines) if double_sided else jnp.maximum(cosines, 0.)
    return (light_color[..., None, :] * vertex_reflectivities
            * jnp.power(cosines, shininess[..., None, None]))


def diffuse_point(vertex_positions, vertex_normals, vertex_colors,
                  light_position, light_color, double_sided=True):
    """Lambertian reflectance under a single point light.

    Args:
        vertex_positions: [*, V, 3].
        vertex_normals: [*, V, 3], assumed normalised.
        vertex_colors: [*, V, C].
        light_position: [*, 3].
        light_color: [*, C].
        double_sided: if true, back faces are shaded like front faces.

    Returns:
        [*, V, C] reflectance.

    Reference: dirt/lighting.py:291-343.
    """
    vertex_positions = jnp.asarray(vertex_positions, jnp.float32)
    vertex_normals = jnp.asarray(vertex_normals, jnp.float32)
    vertex_colors = jnp.asarray(vertex_colors, jnp.float32)
    light_position = jnp.asarray(light_position, jnp.float32)
    light_color = jnp.asarray(light_color, jnp.float32)

    relative_positions = vertex_positions - light_position[..., None, :]
    incident_directions = relative_positions / (
        jnp.linalg.norm(relative_positions, axis=-1, keepdims=True) + 1.e-12)
    cosines = jnp.sum(vertex_normals * incident_directions, axis=-1)
    cosines = jnp.abs(cosines) if double_sided else jnp.maximum(cosines, 0.)
    return light_color[..., None, :] * vertex_colors * cosines[..., None]
