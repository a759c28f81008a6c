"""Offline preprocessing: bake per-view UV / angle / depth maps for a scene.

The TPU-era replacement of the reference's render pipeline
(/root/reference/scripts/scannet/render_uvs.py + the render_uv C++/OpenGL
executables): given a UV-unwrapped mesh and per-frame poses, writes the exact
on-disk contract the data layer (and the reference!) consumes:

    <scene>/uv/<id>.npy                 [H, W, 3]  (u, v, lod placeholder)
    <scene>/uv/<id>.angle.npy           [H, W, 3]  cos angle replicated
    <scene>/uv/<id>.rendered_depth.npy  [H, W, 3]  linear depth replicated
    <scene>/uv_<height>/<id>.npy        pyramid levels (5 heights 256..960)

Rasterization backend: the native C++ rasterizer by default (fast on scan
meshes), the JAX rasterizer as fallback.

Blender's smart-UV unwrap itself stays an external step, exactly as in the
reference (create_uvs.py runs inside Blender); this module consumes its
``*_uvs_blender.ply`` output.
"""

import os
from os.path import basename, exists, join

import numpy as np

from stylemesh_tpu.data.loading import load_extrinsics, rescale_intrinsics
from stylemesh_tpu.geometry.mesh_io import load_mesh

# the reference's pyramid heights: linspace(256, 960, 5)
DEFAULT_PYRAMID_HEIGHTS = (256, 432, 608, 784, 960)


def _rasterize(mesh, cam2world, intrinsics, hw, backend="native"):
    if backend == "native":
        try:
            from stylemesh_tpu.geometry.native import rasterize_mesh_native

            return rasterize_mesh_native(mesh.vertices, mesh.faces, mesh.uvs,
                                         mesh.normals, cam2world, intrinsics, hw)
        except Exception as e:  # toolchain missing -> JAX fallback
            print(f"native rasterizer unavailable ({e}); using JAX fallback")
    from stylemesh_tpu.geometry.rasterize import rasterize_mesh

    uv, ang, depth, hit = rasterize_mesh(mesh.vertices, mesh.faces, mesh.uvs,
                                         mesh.normals, cam2world, intrinsics, hw)
    return np.asarray(uv), np.asarray(ang), np.asarray(depth), np.asarray(hit)


def bake_view(mesh, cam2world, intrinsics, hw, backend="native"):
    """One view -> (uv3 [H,W,3], angle3 [H,W,3], depth3 [H,W,3])."""
    uv, ang, depth, _ = _rasterize(mesh, cam2world, intrinsics, hw, backend)
    uv3 = np.concatenate([uv, np.zeros_like(uv[..., :1])], axis=-1)
    ang3 = np.repeat(ang[..., None], 3, axis=-1)
    depth3 = np.repeat(depth[..., None], 3, axis=-1)
    return uv3.astype(np.float32), ang3.astype(np.float32), depth3.astype(np.float32)


def bake_scene(mesh_path, pose_dir, intrinsics, intrinsics_size, out_dir,
               base_hw=(960, 1280), pyramid_heights=DEFAULT_PYRAMID_HEIGHTS,
               aspect=None, backend="native", skip_existing=True,
               frame_ids=None, verbose=True):
    """Bake a whole scene (render_uvs.py semantics: idempotent per folder).

    Args:
        mesh_path: UV-unwrapped mesh (.ply / .obj).
        pose_dir: directory of ``<id>.txt`` 4x4 cam2world poses.
        intrinsics: [3+,3+] K at ``intrinsics_size`` (w, h).
        out_dir: scene directory to fill with uv/ and uv_<h>/ folders.
        base_hw: resolution of the base uv/angle/depth folder.
        pyramid_heights: heights of the uv_<h> pyramid; widths follow
            ``aspect`` (default base_hw ratio — reference: 1280/960).
    """
    mesh = load_mesh(mesh_path)
    assert mesh.uvs is not None, f"mesh {mesh_path} has no UVs (run unwrap first)"
    if aspect is None:
        aspect = base_hw[1] / base_hw[0]

    pose_files = sorted(
        (f for f in os.listdir(pose_dir) if f.endswith(".txt")),
        key=lambda x: int(x.split(".")[0]))
    if frame_ids is not None:
        wanted = {str(i) for i in frame_ids}
        pose_files = [f for f in pose_files if f.split(".")[0] in wanted]

    base_dir = join(out_dir, "uv")
    os.makedirs(base_dir, exist_ok=True)
    level_dirs = []
    for height in pyramid_heights:
        d = join(out_dir, f"uv_{height}")
        os.makedirs(d, exist_ok=True)
        level_dirs.append((height, d))

    n_baked = 0
    for pf in pose_files:
        frame = pf.split(".")[0]
        cam2world = load_extrinsics(join(pose_dir, pf))
        if not np.all(np.isfinite(cam2world)):
            continue  # ScanNet has -inf poses for untracked frames

        targets = [(base_hw, join(base_dir, f"{frame}.npy"), True)]
        for height, d in level_dirs:
            hw = (height, int(height * aspect))
            targets.append((hw, join(d, f"{frame}.npy"), False))

        for hw, uv_path, is_base in targets:
            if skip_existing and exists(uv_path):
                continue
            k = rescale_intrinsics(intrinsics, intrinsics_size, (hw[1], hw[0]))
            uv3, ang3, depth3 = bake_view(mesh, cam2world, k, hw, backend)
            np.save(uv_path, uv3)
            if is_base:
                np.save(uv_path.replace(".npy", ".angle.npy"), ang3)
                np.save(uv_path.replace(".npy", ".rendered_depth.npy"), depth3)
        n_baked += 1
        if verbose and n_baked % 25 == 0:
            print(f"baked {n_baked}/{len(pose_files)} views")
    return n_baked


def render_mipmap_frames(mesh_path, pose_dir, intrinsics, intrinsics_size,
                         texture_rgb01, out_dir, hw=(480, 640), shading=True,
                         frame_ids=None):
    """Post-train textured render of every pose with the trained texture —
    the ``render_mipmap_{scannet,matterport}`` equivalent (native trilinear
    mipmap render + ambient/diffuse shading like the reference's rgb.frag)."""
    from PIL import Image

    from stylemesh_tpu.geometry.native import render_textured_native

    mesh = load_mesh(mesh_path)
    assert mesh.uvs is not None
    os.makedirs(out_dir, exist_ok=True)
    pose_files = sorted((f for f in os.listdir(pose_dir) if f.endswith(".txt")),
                        key=lambda x: int(x.split(".")[0]))
    if frame_ids is not None:
        wanted = {str(i) for i in frame_ids}
        pose_files = [f for f in pose_files if f.split(".")[0] in wanted]
    k = rescale_intrinsics(intrinsics, intrinsics_size, (hw[1], hw[0]))
    paths = []
    for pf in pose_files:
        frame = pf.split(".")[0]
        cam2world = load_extrinsics(join(pose_dir, pf))
        if not np.all(np.isfinite(cam2world)):
            continue
        img = render_textured_native(mesh.vertices, mesh.faces, mesh.uvs,
                                     mesh.normals, cam2world, k, hw,
                                     texture_rgb01, shading=shading)
        path = join(out_dir, f"{frame}.png")
        Image.fromarray((np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)).save(path)
        paths.append(path)
    return paths
