"""Helper functions for homogeneous transform matrices (TPU-native, jax.numpy).

These functions assume the matrices will *right*-multiply the vectors to be
transformed, i.e. that the inputs are row vectors -- as is the case for a matrix
of vertices indexed naturally.  Equivalently, matrices are indexed by
``*, x/y/z[/w] (in), x/y/z[/w] (out)`` where ``*`` represents any sequence of
leading (batch) dimensions, over all of which the operation is mapped.

API parity with the reference ``dirt/matrices.py`` (see
/root/reference/dirt/matrices.py:15,64,91,110,156,183); the implementation is a
clean jax.numpy rewrite.
"""

import jax.numpy as jnp


def rodrigues(vectors, three_by_three=False):
    """Constructs a batch of angle-axis rotation matrices.

    Angle-axis rotations are defined by a single 3D vector, whose direction is
    the axis of rotation and whose length is the rotation angle in radians.

    Args:
        vectors: array of shape [*, 3].
        three_by_three: if true, return 3x3 matrices without w coordinates.

    Returns:
        array of shape [*, D, D] with D = 3 if three_by_three else 4.

    Reference: dirt/matrices.py:15-61 (including the 1e-12 stabiliser that
    keeps the derivative finite at exactly zero rotation).
    """
    vectors = jnp.asarray(vectors, jnp.float32)
    vectors = vectors + 1.e-12  # keeps the derivative finite at exactly zero
    norms = jnp.linalg.norm(vectors, axis=-1, keepdims=True)  # [*, 1]
    units = vectors / norms
    norms = norms[..., 0]  # [*]

    z = jnp.zeros_like(units[..., 0])
    ux, uy, uz = units[..., 0], units[..., 1], units[..., 2]
    # K is indexed by *, x/y/z (in), x/y/z (out) -- the cross-product matrix
    # for row-vector convention (v @ K = u x v with this layout).
    K = jnp.stack([
        jnp.stack([z, -uz, uy], axis=-1),
        jnp.stack([uz, z, -ux], axis=-1),
        jnp.stack([-uy, ux, z], axis=-1),
    ], axis=-2)

    c = jnp.cos(norms)[..., None, None]
    s = jnp.sin(norms)[..., None, None]

    result_3x3 = (
        c * jnp.eye(3, dtype=vectors.dtype)
        + (1 - c) * units[..., :, None] * units[..., None, :]
        + s * K
    )
    if three_by_three:
        return result_3x3
    return pad_3x3_to_4x4(result_3x3)


def translation(x):
    """Constructs a batch of translation matrices from displacement vectors.

    Args:
        x: array of shape [*, 3].

    Returns:
        array of shape [*, 4, 4].

    Reference: dirt/matrices.py:64-88.
    """
    x = jnp.asarray(x, jnp.float32)
    zeros = jnp.zeros_like(x[..., 0])
    ones = jnp.ones_like(zeros)
    return jnp.stack([
        jnp.stack([ones, zeros, zeros, zeros], axis=-1),
        jnp.stack([zeros, ones, zeros, zeros], axis=-1),
        jnp.stack([zeros, zeros, ones, zeros], axis=-1),
        jnp.stack([x[..., 0], x[..., 1], x[..., 2], ones], axis=-1),
    ], axis=-2)


def scale(x):
    """Constructs a batch of scaling matrices from 3D scale factors.

    Args:
        x: array of shape [*, 3].

    Returns:
        array of shape [*, 4, 4].

    Reference: dirt/matrices.py:91-107.
    """
    x = jnp.asarray(x, jnp.float32)
    diag = jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)
    return diag[..., :, None] * jnp.eye(4, dtype=jnp.float32)


def perspective_projection(near, far, right, aspect):
    """Constructs a batch of OpenGL-convention perspective projection matrices.

    The camera looks along the negative-z axis in view/camera space and the
    positive-z axis in clip space.  All parameters broadcast together.

    Args:
        near: distance to the near clipping plane.
        far: distance to the far clipping plane.
        right: distance of the right-hand frustum edge from centre at the near plane.
        aspect: aspect ratio (height / width) of the viewport.

    Returns:
        array of shape [*, 4, 4] (right-multiplying row vectors).

    Reference: dirt/matrices.py:110-153.
    """
    near = jnp.asarray(near, jnp.float32)
    far = jnp.asarray(far, jnp.float32)
    right = jnp.asarray(right, jnp.float32)
    aspect = jnp.asarray(aspect, jnp.float32)

    top = right * aspect
    shape = jnp.broadcast_shapes(near.shape, far.shape, top.shape, right.shape)
    near = jnp.broadcast_to(near, shape)
    far = jnp.broadcast_to(far, shape)
    top = jnp.broadcast_to(top, shape)
    right = jnp.broadcast_to(right, shape)
    zeros = jnp.zeros(shape, jnp.float32)
    ones = jnp.ones(shape, jnp.float32)

    # Rows are indexed by x/y/z/w (in); columns by x/y/z/w (out); this is the
    # transpose of the usual column-vector OpenGL projection matrix.
    return jnp.stack([
        jnp.stack([near / right, zeros, zeros, zeros], axis=-1),
        jnp.stack([zeros, near / top, zeros, zeros], axis=-1),
        jnp.stack([zeros, zeros, -(far + near) / (far - near), -ones], axis=-1),
        jnp.stack([zeros, zeros, -2. * far * near / (far - near), zeros], axis=-1),
    ], axis=-2)


def pad_3x3_to_4x4(matrix):
    """Pads a [*, 3, 3] transform to a [*, 4, 4] homogeneous transform.

    Reference: dirt/matrices.py:156-180.
    """
    matrix = jnp.asarray(matrix, jnp.float32)
    return jnp.concatenate([
        jnp.concatenate([matrix, jnp.zeros_like(matrix[..., :, :1])], axis=-1),
        jnp.concatenate([
            jnp.zeros_like(matrix[..., :1, :]),
            jnp.ones_like(matrix[..., :1, :1]),
        ], axis=-1),
    ], axis=-2)


def compose(*matrices):
    """Composes a sequence of transforms; the first matrix is applied first.

    With the row-vector convention this is simply the left-to-right matmul of
    the inputs.  Returns the 4x4 identity for an empty sequence.

    Reference: dirt/matrices.py:183-207.
    """
    if len(matrices) == 0:
        return jnp.eye(4, dtype=jnp.float32)
    result = jnp.asarray(matrices[0], jnp.float32)
    for m in matrices[1:]:
        result = jnp.matmul(result, jnp.asarray(m, jnp.float32))
    return result
