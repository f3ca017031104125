"""ctypes bindings for the native C++ rasterisation oracle.

The shared library is built on demand from native/raster_oracle.cpp (plain
C ABI; no pybind11).  Used by the test suite as an implementation-independent
ground truth -- the role OpenGL hardware plays for the reference.
"""

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libraster_oracle.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() or (_LIB_PATH.stat().st_mtime
                                  < (_NATIVE_DIR / "raster_oracle.cpp").stat().st_mtime):
        subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                       env={**os.environ})
    lib = ctypes.CDLL(str(_LIB_PATH))
    argtypes = [
        ctypes.POINTER(ctypes.c_float),   # background
        ctypes.POINTER(ctypes.c_float),   # vertices
        ctypes.POINTER(ctypes.c_float),   # colors
        ctypes.POINTER(ctypes.c_int32),   # faces
        ctypes.c_int32, ctypes.c_int32,   # V, F
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # H, W, C
        ctypes.POINTER(ctypes.c_float),   # out pixels
        ctypes.POINTER(ctypes.c_int32),   # out face index
    ]
    for name in ("dirt_oracle_rasterise", "dirt_oracle_rasterise_clipped"):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = argtypes
    vis64 = lib.dirt_oracle_visibility_f64
    vis64.restype = None
    vis64.argtypes = [
        ctypes.POINTER(ctypes.c_float),   # vertices
        ctypes.POINTER(ctypes.c_int32),   # faces
        ctypes.c_int32, ctypes.c_int32,   # V, F
        ctypes.c_int32, ctypes.c_int32,   # H, W
        ctypes.POINTER(ctypes.c_int32),   # out face index
    ]
    _lib = lib
    return lib


def rasterise(background, vertices, vertex_colors, faces):
    """Rasterises one image with the native oracle.

    Args mirror dirt_tpu.rasterise (single image).  Returns
    (pixels [H, W, C] float32, face_index [H, W] int32).
    """
    lib = _load()
    background = np.ascontiguousarray(background, np.float32)
    vertices = np.ascontiguousarray(vertices, np.float32)
    vertex_colors = np.ascontiguousarray(vertex_colors, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    height, width, channels = background.shape
    pixels = np.empty_like(background)
    face_index = np.empty((height, width), np.int32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.dirt_oracle_rasterise(
        fptr(background), fptr(vertices), fptr(vertex_colors), iptr(faces),
        np.int32(vertices.shape[0]), np.int32(faces.shape[0]),
        np.int32(height), np.int32(width), np.int32(channels),
        fptr(pixels), iptr(face_index))
    return pixels, face_index


def visibility_f64(vertices, faces, height, width):
    """Winner map with all visibility arithmetic in double precision.

    The adjudicator for near-tie winner disagreements between f32 backends
    (sub-pixel face densities where edge-function cancellation makes the
    pick implementation-sensitive): f32 inputs promote exactly to f64 and
    24-bit products are exact there, so this map reflects the true
    geometry.  Not a bit-parity target for f32 backends.

    Returns face_index [H, W] int32 (-1 background).
    """
    lib = _load()
    vertices = np.ascontiguousarray(vertices, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    face_index = np.empty((height, width), np.int32)
    lib.dirt_oracle_visibility_f64(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.int32(vertices.shape[0]), np.int32(faces.shape[0]),
        np.int32(height), np.int32(width),
        face_index.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return face_index


def rasterise_clipped(background, vertices, vertex_colors, faces):
    """Rasterises one image with the GL-polygon-clipping oracle.

    Independently derived ground truth for w <= 0 semantics: true
    Sutherland-Hodgman clipping against {w >= eps, -w <= z <= w} followed by
    projected 2-D rasterisation -- what GL hardware does for the reference
    (csrc/rasterise_egl.cpp:362-380).  Coverage may differ from the
    per-fragment backends only in a one-pixel band at region boundaries.

    Returns (pixels [H, W, C] float32, face_index [H, W] int32).
    """
    lib = _load()
    background = np.ascontiguousarray(background, np.float32)
    vertices = np.ascontiguousarray(vertices, np.float32)
    vertex_colors = np.ascontiguousarray(vertex_colors, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    height, width, channels = background.shape
    assert channels <= 8, "clipped oracle supports up to 8 attributes"
    pixels = np.empty_like(background)
    face_index = np.empty((height, width), np.int32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    iptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.dirt_oracle_rasterise_clipped(
        fptr(background), fptr(vertices), fptr(vertex_colors), iptr(faces),
        np.int32(vertices.shape[0]), np.int32(faces.shape[0]),
        np.int32(height), np.int32(width), np.int32(channels),
        fptr(pixels), iptr(face_index))
    return pixels, face_index
