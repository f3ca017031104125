"""Triangle setup and fragment math for the TPU-native rasteriser.

The reference implementation (pmh47/dirt) delegates triangle setup, clipping,
perspective division and depth testing to OpenGL hardware
(csrc/shaders.cpp:16-43, csrc/rasterise_egl.cpp:362-380).  On TPU we own the
rasteriser, so this module defines the exact fragment semantics, built on
*homogeneous* (2D-projective) edge functions a la Olano & Greer: for a triangle
with clip-space corners p0, p1, p2 (using components x, y, w), the edge
functions are

    e_i = cross(p_j, p_k)         (i, j, k) cyclic, in (x, y, w) space
    E_i(q) = e_i . (x_ndc, y_ndc, 1)

with the identities (derivable from E_i = w_j * w_k * 2 * signed_area_i):

    perspective-correct barycentric  b_i     = E_i / (E_0 + E_1 + E_2)
    fragment clip-space w            w_frag  = sum_i E_i w_i / sum_i E_i
    NDC depth (screen-linear)        z_ndc   = sum_i E_i z_i / sum_i E_i w_i

This reproduces OpenGL's `smooth` (perspective-correct) attribute
interpolation and its screen-linear depth interpolation without ever clipping
polygons: near/far clipping becomes the per-fragment test |Z| <= |W| (with the
correct sign conventions), which yields the same coverage as exact polygon
clipping for EVERY w sign pattern, including triangles crossing the camera
plane (w = 0).  The argument:

  * GL clips the triangle against the volume {w > 0, -w <= z <= w} (the x/y
    planes never change which on-screen pixels are covered) and rasterises
    the projected sub-polygon.  In exact arithmetic that coverage is
    { pixels q : the point P of the triangle projecting to q has
      w(P) > 0 and |z(P)| <= w(P) }.
  * The per-fragment rule computes, at pixel q, S_e = sum E_i, S_w = sum
    E_i w_i, S_z = sum E_i z_i with w(P) = S_w / S_e and z(P) = S_z / S_e.
    Inside the positive-sign region (in_p) every E_i >= 0 so S_e > 0, and
    the branch condition S_w > 0 is exactly w(P) > 0; symmetrically for the
    negative region (in_n, S_e < 0), S_w < 0 is again w(P) > 0.  The
    "anti-region" a camera-crossing triangle sweeps through infinity -- the
    projection of its w < 0 part -- always fails the branch's S_w sign test,
    so it is never rasterised, exactly as GL clips it away.  |S_z| <= |S_w|
    with the branch's sign is |z(P)| <= w(P) since z/w is screen-affine.

  Real GL clips at finite precision (new vertices on the w = 0 plane project
  to finite coordinates), so implementations may differ from the exact rule
  within a pixel of a clipped region's boundary; the native oracle's
  independently-derived clipping mode (native/raster_oracle.cpp,
  dirt_oracle_rasterise_clipped) pins this agreement in tests.

Conventions (matching the reference):
  * images are top-row-first (README.md:183); pixel (row r, col c) has centre
    at NDC (x, y) = ((c + .5) * 2/W - 1,  1 - (r + .5) * 2/H)
  * depth test is strict less-than against a far-plane clear (GL_LESS vs
    glClearDepth(1), csrc/rasterise_egl.cpp:213,371), ties between fragments
    resolved in favour of the earliest face in the buffer (GL draw order)
  * no backface culling (GL_CULL_FACE is never enabled in the reference), so
    both windings rasterise; the all-negative edge-sign branch covers CW faces
  * shared edges rasterise exactly once, via a top-left fill rule applied to
    E_i == 0 pixels (the reference inherits an unspecified-but-consistent rule
    from GL hardware)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp


class FaceSetup(NamedTuple):
    """Per-face rasterisation constants.  Leading dims [*, F]."""
    e: jnp.ndarray        # [*, F, 3, 3] edge coefficients (a, b, c) per edge
    z: jnp.ndarray        # [*, F, 3] clip-space z per corner
    w: jnp.ndarray        # [*, F, 3] clip-space w per corner
    accept: jnp.ndarray   # [*, F, 3] bool: include pixels with E_i == 0
    valid: jnp.ndarray    # [*, F] bool: non-degenerate triangle


def pixel_centre_ndc(height, width, dtype=jnp.float32):
    """NDC coordinates of pixel centres: returns (x_ndc [W], y_ndc [H])."""
    cols = jnp.arange(width, dtype=dtype)
    rows = jnp.arange(height, dtype=dtype)
    x_ndc = (cols + 0.5) * (2.0 / width) - 1.0
    y_ndc = 1.0 - (rows + 0.5) * (2.0 / height)
    return x_ndc, y_ndc


def _cross_xyw(u, v):
    """Cross product of [..., 3] vectors laid out as (x, y, w).

    The six products pass through an optimization barrier so each is rounded
    *separately* before the subtractions.  If XLA contracts a*b - round(c*d)
    into an FMA, cross(u, v) is no longer the exact IEEE negation of
    cross(v, u) -- both evaluate to (rounding error of the product) with the
    SAME sign -- and the two triangles sharing an edge then disagree about
    pixels whose centres lie exactly on it (double-covers and pinholes).
    Exactly-once rasterisation of shared edges (a guarantee the reference
    inherits from GL hardware) depends on this antisymmetry.
    """
    ux, uy, uw = u[..., 0], u[..., 1], u[..., 2]
    vx, vy, vw = v[..., 0], v[..., 1], v[..., 2]
    t0, t1, t2, t3, t4, t5 = jax.lax.optimization_barrier(
        (uy * vw, uw * vy, uw * vx, ux * vw, ux * vy, uy * vx))
    return jnp.stack([t0 - t1, t2 - t3, t4 - t5], axis=-1)


def face_setup(vertices, faces):
    """Computes per-face rasterisation constants.

    Args:
        vertices: [*, V, 4] clip-space positions.
        faces: [*, F, 3] int vertex indices (broadcast over * if unbatched).

    Returns:
        FaceSetup with leading dims [*, F].
    """
    vertices = jnp.asarray(vertices, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    corners = jnp.take_along_axis(
        vertices[..., None, :, :],                      # [*, 1, V, 4]
        faces[..., :, :, None],                         # [*, F, 3, 1]
        axis=-2,
    )  # [*, F, 3, 4]

    p = corners[..., (0, 1, 3)]                          # (x, y, w) per corner
    e0 = _cross_xyw(p[..., 1, :], p[..., 2, :])
    e1 = _cross_xyw(p[..., 2, :], p[..., 0, :])
    e2 = _cross_xyw(p[..., 0, :], p[..., 1, :])
    e = jnp.stack([e0, e1, e2], axis=-2)                 # [*, F, 3, 3]

    # D = det[p0; p1; p2] in (x, y, w); zero iff the projected triangle is
    # degenerate (zero screen area), which GL rasterises to nothing.
    d = jnp.sum(p[..., 0, :] * e0, axis=-1)
    valid = d != 0.0

    # Top-left fill rule on E_i == 0 pixels, expressed on the edge gradient
    # (a, b) = (dE/dx_ndc, dE/dy_ndc) for positive-interior edges; the
    # negative-interior branch uses the complement, so shared edges (whose
    # coefficients are exact IEEE negations of each other) rasterise once.
    a = e[..., 0]
    b = e[..., 1]
    accept = (a > 0) | ((a == 0) & (b > 0))

    return FaceSetup(
        e=e,
        z=corners[..., 2],
        w=corners[..., 3],
        accept=accept,
        valid=valid,
    )


def edge_values(e, x_ndc, y_ndc):
    """Evaluates the three edge functions at the given pixel centres.

    The results pass through an optimization barrier: coverage decisions
    compare E_i against exactly 0.0, and without the barrier XLA may duplicate
    this cheap computation into several fusions, each free to contract
    mul+add into FMA differently -- near-zero edge values then flip sign
    *between copies of the same expression*, producing self-inconsistent
    coverage (observed as pinholes along shared edges).  The barrier
    materialises one canonical value for every downstream use.
    """
    E0 = e[..., 0, 0] * x_ndc + e[..., 0, 1] * y_ndc + e[..., 0, 2]
    E1 = e[..., 1, 0] * x_ndc + e[..., 1, 1] * y_ndc + e[..., 1, 2]
    E2 = e[..., 2, 0] * x_ndc + e[..., 2, 1] * y_ndc + e[..., 2, 2]
    return jax.lax.optimization_barrier((E0, E1, E2))


def fragment_cover_depth(e, z, w, accept, valid, x_ndc, y_ndc):
    """Coverage and depth of one face's fragments at the given pixel centres.

    All face arguments are for a single face and broadcast against the pixel
    grids: e [3, 3] (or scalars pre-split), z/w/accept [3], valid scalar;
    x_ndc/y_ndc are broadcastable pixel-centre grids.

    Returns:
        covered: bool array, pixel covered by this face.
        depth: float array, screen-linear NDC z in [-1, 1] where covered,
            +inf elsewhere.
    """
    E0, E1, E2 = edge_values(e, x_ndc, y_ndc)

    s_w = E0 * w[..., 0] + E1 * w[..., 1] + E2 * w[..., 2]
    s_z = E0 * z[..., 0] + E1 * z[..., 1] + E2 * z[..., 2]

    a0, a1, a2 = accept[..., 0], accept[..., 1], accept[..., 2]
    in_p = (((E0 > 0) | ((E0 == 0) & a0))
            & ((E1 > 0) | ((E1 == 0) & a1))
            & ((E2 > 0) | ((E2 == 0) & a2)))
    in_n = (((E0 < 0) | ((E0 == 0) & ~a0))
            & ((E1 < 0) | ((E1 == 0) & ~a1))
            & ((E2 < 0) | ((E2 == 0) & ~a2)))
    # Near/far clip per fragment: z_ndc in [-1, 1] <=> |S_z| <= |S_w| with the
    # branch's sign; w_frag > 0 <=> S_w has the branch's sign.
    cov_p = in_p & (s_w > 0) & (s_z >= -s_w) & (s_z <= s_w)
    cov_n = in_n & (s_w < 0) & (s_z <= -s_w) & (s_z >= s_w)
    covered = (cov_p | cov_n) & valid

    # The division is deliberately unmasked: guarding the denominator with
    # `where(covered, s_w, 1.0)` is unsound under XLA, which may rematerialise
    # `covered` per consuming fusion with different FMA contraction, so the
    # guard and the outer select can disagree at E_i == 0 pixels and leak
    # s_z / 1.0 as a (very wrong) finite depth.  Raw division yields at worst
    # inf/nan where covered is false, which the select discards; covered
    # pixels always have s_w != 0 (coverage requires a strict sign on s_w).
    depth = jnp.where(covered, s_z / s_w, jnp.inf)
    return covered, depth


def fragment_barycentrics(e, x_ndc, y_ndc, w=None):
    """Perspective-correct barycentrics (and optionally fragment clip w).

    Args:
        e: [..., 3, 3] edge coefficients (broadcast against pixel grids).
        x_ndc, y_ndc: pixel-centre grids.
        w: optional [..., 3] corner clip-w; if given, also returns w_frag.

    Returns:
        bary [..., 3] (perspective-correct, sums to ~1), and clip-space w of
        the fragment if `w` was provided.  Only meaningful at covered pixels.
    """
    E0, E1, E2 = edge_values(e, x_ndc, y_ndc)
    s_e = E0 + E1 + E2
    denom = jnp.where(s_e == 0, 1.0, s_e)
    bary = jnp.stack([E0 / denom, E1 / denom, E2 / denom], axis=-1)
    if w is None:
        return bary
    s_w = E0 * w[..., 0] + E1 * w[..., 1] + E2 * w[..., 2]
    return bary, s_w / denom


def interpolate_attributes(e, x_ndc, y_ndc, corner_attributes):
    """Perspective-correct attribute interpolation, constant-preserving.

    Computes (sum_i E_i * a_i) / (sum_i E_i) with a single division so that
    constant attributes interpolate bit-exactly to themselves (the invariance
    the reference gets from GL hardware and that tests/square_test.py:54
    asserts via exact pixel equality).

    Args:
        e: [..., 3, 3] edge coefficients.
        x_ndc, y_ndc: pixel-centre grids, broadcastable against e[..., 0, 0].
        corner_attributes: [..., 3, C].

    Returns:
        [..., C] interpolated attributes.
    """
    E0, E1, E2 = edge_values(e, x_ndc, y_ndc)
    s_e = (E0 + E1) + E2
    num = ((E0[..., None] * corner_attributes[..., 0, :]
            + E1[..., None] * corner_attributes[..., 1, :])
           + E2[..., None] * corner_attributes[..., 2, :])
    denom = jnp.where(s_e == 0, 1.0, s_e)
    return num / denom[..., None]
