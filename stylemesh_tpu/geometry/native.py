"""ctypes bindings to the native (C++) rasterizer.

The reference's only native code is its OpenGL preprocessing/render stack
(SURVEY.md §2.3); ``native/rasterizer.cpp`` is the GL-free CPU equivalent.
This module builds the shared library on first use (``make`` in native/) and
exposes numpy-level wrappers with the same output contract as
:func:`stylemesh_tpu.geometry.rasterize.rasterize_mesh` — plus the textured
mipmap forward render used by the post-training video step.
"""

import ctypes
import os
import subprocess
from os.path import dirname, exists, join

import numpy as np

_NATIVE_DIR = join(dirname(dirname(dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = join(_NATIVE_DIR, "libstylemesh_native.so")
_lib = None


def _build():
    subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                   capture_output=True, text=True)


def _stale():
    """True when sources are newer than the built library."""
    if not exists(_LIB_PATH):
        return True
    lib_mtime = os.path.getmtime(_LIB_PATH)
    for fn in os.listdir(_NATIVE_DIR):
        if fn.endswith((".cpp", ".h", ".hpp")) or fn == "Makefile":
            if os.path.getmtime(join(_NATIVE_DIR, fn)) > lib_mtime:
                return True
    return False


def load_library(rebuild=False):
    global _lib
    if _lib is not None and not rebuild:
        return _lib
    if rebuild or _stale():
        _build()
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # stale/foreign-arch binary: rebuild from source and retry
        _build()
        lib = ctypes.CDLL(_LIB_PATH)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.sm_rasterize.restype = ctypes.c_int64
    lib.sm_rasterize.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, f32p, f32p, f32p,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, f32p, f32p, f32p, f32p,
    ]
    lib.sm_render_textured.restype = ctypes.c_int64
    lib.sm_render_textured.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, f32p, f32p, f32p,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, f32p,
    ]
    lib.sm_render_vertex_colors.restype = ctypes.c_int64
    lib.sm_render_vertex_colors.argtypes = [
        f32p, ctypes.c_int64, i32p, ctypes.c_int64, f32p, f32p, f32p,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int32, ctypes.c_int32, f32p, f32p,
    ]
    _lib = lib
    return lib


def _prep(vertices, faces, uvs, normals, cam2world):
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    u = np.ascontiguousarray(uvs, np.float32)
    n = np.ascontiguousarray(normals, np.float32)
    c = np.ascontiguousarray(np.asarray(cam2world, np.float32).reshape(16))
    return v, f, u, n, c


def rasterize_mesh_native(vertices, faces, uvs, normals, cam2world,
                          intrinsics, hw):
    """Native twin of ``rasterize_mesh``: returns (uv [H,W,2],
    cos_angle [H,W], depth [H,W], hit [H,W], lod [H,W]).

    ``lod`` is the baked mip level (uvmap.frag's textureQueryLod channel,
    computed against the GL bake-time 1024^2 texture, clamped to [0, 10])."""
    lib = load_library()
    v, f, u, n, c = _prep(vertices, faces, uvs, normals, cam2world)
    k = np.asarray(intrinsics, np.float32)
    h, w = hw
    out_uv = np.zeros((h, w, 2), np.float32)
    out_angle = np.zeros((h, w), np.float32)
    out_depth = np.zeros((h, w), np.float32)
    out_lod = np.zeros((h, w), np.float32)
    lib.sm_rasterize(v, len(v), f, len(f), u, n, c,
                     float(k[0, 0]), float(k[1, 1]), float(k[0, 2]), float(k[1, 2]),
                     h, w, out_uv, out_angle, out_depth, out_lod)
    return out_uv, out_angle, out_depth, out_depth > 0, out_lod


def render_vertex_colors_native(vertices, faces, colors, normals, cam2world,
                                intrinsics, hw, return_depth=False):
    """Per-vertex-color render — the reference's vertex_color shader mode
    (scripts/scannet/render_uv/shader/vertex_color.frag, the ``mesh_colors``
    flag src/main.cpp:77-78; Matterport color3D.frag). The output path for
    segmentation recoloring / mesh-editing demos (geometry/segmentation.py).

    ``colors``: [n_verts, 3] in [0, 1]. Returns [H, W, 3] float (background
    0), plus the linear-depth map when ``return_depth``."""
    lib = load_library()
    v, f, col, n, c = _prep(vertices, faces, colors, normals, cam2world)
    k = np.asarray(intrinsics, np.float32)
    h, w = hw
    out = np.zeros((h, w, 3), np.float32)
    out_depth = np.zeros((h, w), np.float32)
    lib.sm_render_vertex_colors(v, len(v), f, len(f), col, n, c,
                                float(k[0, 0]), float(k[1, 1]),
                                float(k[0, 2]), float(k[1, 2]), h, w,
                                out, out_depth)
    return (out, out_depth) if return_depth else out


def render_textured_native(vertices, faces, uvs, normals, cam2world,
                           intrinsics, hw, texture, shading=True,
                           max_aniso=8):
    """Textured mipmap render (the reference's post-train renderer,
    renderer.cpp:110-140 + rgb.frag shading). ``texture``: [Ht, Wt, 3] in
    [0, 1]. Returns [H, W, 3] float.

    ``max_aniso`` matches the reference's GL_TEXTURE_MAX_ANISOTROPY_EXT = 8
    (renderer.cpp:110-140): up to N trilinear taps along the major
    screen-space uv-derivative axis; 1 = plain trilinear."""
    lib = load_library()
    v, f, u, n, c = _prep(vertices, faces, uvs, normals, cam2world)
    k = np.asarray(intrinsics, np.float32)
    h, w = hw
    tex = np.ascontiguousarray(texture, np.float32)
    out = np.zeros((h, w, 3), np.float32)
    lib.sm_render_textured(v, len(v), f, len(f), u, n, c,
                           float(k[0, 0]), float(k[1, 1]), float(k[0, 2]),
                           float(k[1, 2]), h, w,
                           tex, tex.shape[0], tex.shape[1],
                           1 if shading else 0, int(max_aniso), out)
    return out
