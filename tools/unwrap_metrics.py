"""Quantify unwrap quality (geometry/unwrap.py vs the Blender contract).

The reference bakes atlases with Blender's ``uv.smart_project``
(/root/reference/scripts/scannet/create_uvs.py:98-107); our built-in
``smart_project`` is the same algorithm family but a simpler packer. This
tool measures the qualities that matter downstream of the unwrap:

- islands:        island count (more islands = more seams = splat cost)
- texel_util:     fraction of the atlas covered by triangles (rasterized);
                  waste is resolution thrown away at a fixed texture size
- overlap_frac:   covered texels claimed by >1 triangle (should be ~0)
- seam_ratio:     3D length of UV-split edges / total interior edge length
- stretch_sigma:  per-face sqrt(uv_area / 3d_area) normalized to mean 1,
                  reported as stddev (0 = perfectly uniform texel density)

Run on a reproducible fixture set (synthetic room + multi-object scene +
icosphere). A Blender-exported ``*_uvs_blender.ply`` passed as argv runs the
same metrics on it for a direct gap table (no Blender in this image, so by
default only the built-in unwrap is measured; Blender-typical values from
its smart_project documentation/defaults are listed in RESULTS.md for
context, clearly marked as not measured here).

Usage:
  python tools/unwrap_metrics.py               # fixtures -> results/unwrap_metrics.json
  python tools/unwrap_metrics.py mesh.ply ...  # metrics for existing unwrapped meshes
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from stylemesh_tpu.geometry.mesh_io import Mesh
from stylemesh_tpu.geometry.unwrap import smart_project


# ----------------------------------------------------------------- fixtures

def _icosphere(subdiv=3, radius=1.0):
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.asarray([
        (-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
        (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
        (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1)], np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
             (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
             (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
             (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    for _ in range(subdiv):
        cache = {}
        verts = list(map(tuple, verts))

        def mid(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                p = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2.0
                p /= np.linalg.norm(p)
                cache[key] = len(verts)
                verts.append(tuple(p))
            return cache[key]

        nf = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        faces = nf
        verts = np.asarray(verts, np.float64)
    return (np.asarray(verts, np.float32) * radius,
            np.asarray(faces, np.int32))


def _box(center, size):
    c = np.asarray(center, np.float32)
    s = np.asarray(size, np.float32) / 2
    corners = np.asarray([(x, y, z) for x in (-1, 1) for y in (-1, 1)
                          for z in (-1, 1)], np.float32) * s + c
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, cc, d in quads:
        faces += [(a, b, cc), (a, cc, d)]
    return corners, np.asarray(faces, np.int32)


def fixture_meshes():
    out = {}
    from stylemesh_tpu.data.demo_scene import room_mesh
    out["room"] = room_mesh()

    # multi-object scene: room + boxes + sphere (seam-heavy, mixed normals)
    vs, fs = [], []
    off = 0
    for v, f in [_box((0, 0, 0), (8, 8, 3)),
                 _box((2, 1, -0.5), (1.5, 1.0, 2.0)),
                 _box((-2, -2, -1.0), (2.0, 0.8, 1.0)),
                 _icosphere(3, 0.9)]:
        vs.append(np.asarray(v, np.float32))
        fs.append(np.asarray(f, np.int32) + off)
        off += len(v)
    out["scene"] = Mesh(vertices=np.concatenate(vs),
                        faces=np.concatenate(fs), uvs=None, normals=None,
                        colors=None).with_generated_normals()

    v, f = _icosphere(4, 1.0)
    out["icosphere"] = Mesh(vertices=v, faces=f, uvs=None, normals=None,
                            colors=None).with_generated_normals()
    return out


# ------------------------------------------------------------------ metrics

def _rasterize_coverage(uvs, faces, island_of, res=1024):
    """Per-texel coverage + CROSS-ISLAND overlap count (vectorized
    half-plane test per face over its bbox). Texels on an edge shared by
    two triangles of the same island are legitimate single coverage, so
    overlap is only charged when two different islands claim a texel."""
    owner = np.full((res, res), -1, np.int64)
    overlap = np.zeros((res, res), bool)
    tri = uvs[faces] * res  # [F, 3, 2] in pixel units
    for fi, t in enumerate(tri):
        lo = np.clip(np.floor(t.min(0) - 0.5).astype(int), 0, res - 1)
        hi = np.clip(np.ceil(t.max(0) + 0.5).astype(int), 0, res)
        if hi[0] <= lo[0] or hi[1] <= lo[1]:
            continue
        xs = np.arange(lo[0], hi[0]) + 0.5
        ys = np.arange(lo[1], hi[1]) + 0.5
        px, py = np.meshgrid(xs, ys)
        def edge(a, b):
            return ((b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0]))
        e0, e1, e2 = edge(t[0], t[1]), edge(t[1], t[2]), edge(t[2], t[0])
        inside = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                 ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        sub = owner[lo[1]:hi[1], lo[0]:hi[0]]
        isl = island_of[fi]
        overlap[lo[1]:hi[1], lo[0]:hi[0]] |= inside & (sub >= 0) & (sub != isl)
        sub[inside] = isl
    return owner >= 0, overlap


def unwrap_metrics(mesh: Mesh, res=1024):
    """All metrics for an unwrapped (vertex-split, per-vertex-uv) mesh."""
    assert mesh.uvs is not None
    uvs = np.asarray(mesh.uvs, np.float64)
    faces = np.asarray(mesh.faces, np.int64)
    verts = np.asarray(mesh.vertices, np.float64)

    # --- island count: connected components over shared 3D-edge + matching UV
    # (faces joined in UV space belong to one island)
    from collections import defaultdict
    key_of = {}
    def vkey(i):
        if i not in key_of:
            key_of[i] = tuple(np.round(verts[i], 6))
        return key_of[i]

    edge_faces = defaultdict(list)
    for fi, f in enumerate(faces):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            k = frozenset((vkey(f[a]), vkey(f[b])))
            edge_faces[k].append((fi, f[a], f[b]))

    parent = list(range(len(faces)))
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    seam_len = 0.0
    interior_len = 0.0
    for k, lst in edge_faces.items():
        if len(lst) < 2:
            continue
        (fa, a0, a1), (fb, b0, b1) = lst[0], lst[1]
        length = float(np.linalg.norm(verts[a0] - verts[a1]))
        interior_len += length
        # UV-continuous edge: endpoint uvs match across the two faces
        ua = {vkey(a0): uvs[a0], vkey(a1): uvs[a1]}
        ub = {vkey(b0): uvs[b0], vkey(b1): uvs[b1]}
        cont = all(np.allclose(ua[kk], ub[kk], atol=1e-7) for kk in ua)
        if cont:
            ra, rb = find(fa), find(fb)
            if ra != rb:
                parent[ra] = rb
        else:
            seam_len += length
    islands = len({find(i) for i in range(len(faces))})

    # --- areas / stretch
    tri3 = verts[faces]
    a3 = 0.5 * np.linalg.norm(np.cross(tri3[:, 1] - tri3[:, 0],
                                       tri3[:, 2] - tri3[:, 0]), axis=1)
    tri2 = uvs[faces]
    a2 = 0.5 * np.abs(np.cross(tri2[:, 1] - tri2[:, 0],
                               tri2[:, 2] - tri2[:, 0]))
    ok = a3 > 1e-12
    density = np.sqrt(np.maximum(a2[ok], 1e-18) / a3[ok])
    density = density / max(np.mean(density), 1e-18)
    stretch_sigma = float(np.std(density))

    island_of = np.asarray([find(i) for i in range(len(faces))])
    covered_m, overlap_m = _rasterize_coverage(
        np.asarray(uvs, np.float64), faces, island_of, res)
    covered = int(covered_m.sum())
    overlap = int(overlap_m.sum())
    return {
        "faces": int(len(faces)),
        "islands": int(islands),
        "texel_util": covered / (res * res),
        "overlap_frac": overlap / max(covered, 1),
        "seam_ratio": seam_len / max(interior_len, 1e-12),
        "stretch_sigma": stretch_sigma,
        "uv_area_sum": float(a2.sum()),
    }


def main(argv):
    results = {}
    if argv:
        from stylemesh_tpu.geometry.mesh_io import load_mesh
        for p in argv:
            results[os.path.basename(p)] = unwrap_metrics(load_mesh(p))
    else:
        for name, mesh in fixture_meshes().items():
            un = smart_project(mesh)
            results[name] = unwrap_metrics(un)
            print(f"# {name}: {json.dumps(results[name])}", flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "unwrap_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:])
