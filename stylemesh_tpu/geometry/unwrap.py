"""UV unwrapping: a smart-projection atlas generator.

The reference delegates unwrapping to headless Blender
(/root/reference/scripts/scannet/create_uvs.py:98-107 —
``uv.smart_project(angle_limit=1.2217)`` after decimation). This module
provides a built-in equivalent so the framework is self-contained on machines
without Blender: faces are binned by dominant normal direction (the 6 axis
planes), grown into edge-connected islands, orthographically projected, and
shelf-packed into the unit square with margins. Output is a vertex-split mesh
with per-vertex UVs — the same contract as the Blender export.

For production-quality seams Blender remains a drop-in alternative (the baked
``*_uvs_blender.ply`` files load through :mod:`stylemesh_tpu.geometry.mesh_io`).
"""

import dataclasses
from collections import defaultdict

import numpy as np

from stylemesh_tpu.geometry.mesh_io import Mesh, compute_vertex_normals

# axis-projection table: dominant axis bin -> (u axis, v axis)
_PROJ = {
    0: (1, 2), 1: (1, 2),  # ±X -> (y, z)
    2: (0, 2), 3: (0, 2),  # ±Y -> (x, z)
    4: (0, 1), 5: (0, 1),  # ±Z -> (x, y)
}


def _face_bins(vertices, faces):
    fn = np.cross(vertices[faces[:, 1]] - vertices[faces[:, 0]],
                  vertices[faces[:, 2]] - vertices[faces[:, 0]])
    ax = np.argmax(np.abs(fn), axis=1)
    sign = (np.take_along_axis(fn, ax[:, None], 1)[:, 0] < 0).astype(np.int64)
    return ax * 2 + sign  # 0..5


def _islands(faces, bins):
    """Edge-connected components of faces within the same bin."""
    edge_to_faces = defaultdict(list)
    for fi, (a, b, c) in enumerate(faces):
        for e in ((a, b), (b, c), (c, a)):
            edge_to_faces[frozenset(e)].append(fi)

    parent = list(range(len(faces)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[rx] = ry

    for fs in edge_to_faces.values():
        for i in range(1, len(fs)):
            if bins[fs[i]] == bins[fs[0]]:
                union(fs[i], fs[0])
    groups = defaultdict(list)
    for fi in range(len(faces)):
        groups[find(fi)].append(fi)
    return list(groups.values())


def smart_project(mesh: Mesh, margin=0.002) -> Mesh:
    """Unwrap ``mesh`` into a packed atlas; returns a mesh with UVs (vertices
    are split so each island owns its corners, like any unwrap seam)."""
    vertices = np.asarray(mesh.vertices, np.float32)
    faces = np.asarray(mesh.faces, np.int64)
    bins = _face_bins(vertices, faces)
    islands = _islands(faces, bins)

    # project each island, collect its 2D bbox
    proj = []  # (face_ids, uv2 [n_faces, 3, 2])
    for island in islands:
        b = bins[island[0]]
        ua, va = _PROJ[b]
        pts = vertices[faces[island]][..., (ua, va)]  # [n, 3, 2]
        mn = pts.reshape(-1, 2).min(0)
        pts = pts - mn
        proj.append((island, pts))

    # shelf packing by descending height, normalized to unit square
    order = sorted(range(len(proj)),
                   key=lambda i: -proj[i][1].reshape(-1, 2)[:, 1].max())
    sizes = [proj[i][1].reshape(-1, 2).max(0) for i in range(len(proj))]
    total_area = sum((s[0] + 1e-6) * (s[1] + 1e-6) for s in sizes)
    scale = 1.0 / np.sqrt(total_area) * 0.9  # pre-scale into ~unit square

    shelf_x, shelf_y, shelf_h = 0.0, 0.0, 0.0
    offsets = [None] * len(proj)
    max_x = 1.0
    for i in order:
        w, h = sizes[i] * scale
        if shelf_x + w + margin > max_x and shelf_x > 0:
            shelf_y += shelf_h + margin
            shelf_x, shelf_h = 0.0, 0.0
        offsets[i] = (shelf_x, shelf_y)
        shelf_x += w + margin
        shelf_h = max(shelf_h, h)
    height_used = shelf_y + shelf_h + margin

    # second normalization so everything fits [0, 1]
    norm = 1.0 / max(1.0, height_used)

    # emit per-corner uvs -> vertex-split mesh
    n_faces = len(faces)
    new_vertices = np.empty((n_faces * 3, 3), np.float32)
    new_faces = np.arange(n_faces * 3, dtype=np.int32).reshape(n_faces, 3)
    new_uvs = np.empty((n_faces * 3, 2), np.float32)
    src_normals = (mesh.normals if mesh.normals is not None
                   else compute_vertex_normals(vertices, faces))
    new_normals = np.empty((n_faces * 3, 3), np.float32)
    new_colors = (np.empty((n_faces * 3, 3), np.float32)
                  if mesh.colors is not None else None)

    for i, (island, pts) in enumerate(proj):
        ox, oy = offsets[i]
        uv = (pts * scale + np.asarray([ox, oy])) * norm
        for k, fi in enumerate(island):
            for c in range(3):
                vi = faces[fi][c]
                new_vertices[fi * 3 + c] = vertices[vi]
                new_uvs[fi * 3 + c] = uv[k, c]
                new_normals[fi * 3 + c] = src_normals[vi]
                if new_colors is not None:
                    new_colors[fi * 3 + c] = mesh.colors[vi]

    return Mesh(vertices=new_vertices, faces=new_faces, uvs=new_uvs,
                normals=new_normals, colors=new_colors)


def decimate(mesh: Mesh, max_faces: int) -> Mesh:
    """Face-count reduction via vertex clustering (the reference decimates to
    <= 500k faces in Blender before unwrapping, create_uvs.py:81-95). Vertex
    clustering is cruder than Blender's collapse decimation but dependency-
    free; for quality, decimate externally."""
    if len(mesh.faces) <= max_faces:
        return mesh
    v = mesh.vertices
    # binary-search the grid resolution that hits the budget
    lo, hi = 1, 1024
    best = None
    bbox_min, bbox_size = v.min(0), np.maximum(v.max(0) - v.min(0), 1e-6)
    while lo <= hi:
        mid = (lo + hi) // 2
        cell = np.floor((v - bbox_min) / bbox_size * (mid - 1e-4)).astype(np.int64)
        key = (cell[:, 0] * mid + cell[:, 1]) * mid + cell[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
        f = inv[mesh.faces]
        keep = (f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2])
        n = int(keep.sum())
        if n <= max_faces:
            best = (mid, inv, f[keep])
            lo = mid + 1
        else:
            hi = mid - 1
    if best is None:
        return mesh
    mid, inv, new_faces = best
    # cluster centroid positions
    counts = np.bincount(inv)
    pos = np.zeros((len(counts), 3), np.float64)
    for d in range(3):
        pos[:, d] = np.bincount(inv, weights=v[:, d]) / counts
    out = Mesh(vertices=pos.astype(np.float32),
               faces=new_faces.astype(np.int32), uvs=None, normals=None,
               colors=None)
    return out.with_generated_normals()
