"""Unwrap, decimation, .house parsing, segmentation, .sens, blur filter."""

import json

import numpy as np
from PIL import Image

from stylemesh_tpu.data.filters import filter_blurry, undo_filter
from stylemesh_tpu.data.matterport_house import parse_house
from stylemesh_tpu.geometry.mesh_io import Mesh
from stylemesh_tpu.geometry.segmentation import (
    SegmentationProvider,
    move_object_vertices,
    split_mesh_at_object,
)
from stylemesh_tpu.geometry.unwrap import decimate, smart_project

RNG = np.random.default_rng(61)


def _box_mesh():
    """Axis-aligned unit cube (12 faces, 8 verts)."""
    v = np.array([[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
                 np.float32)
    f = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x- x+
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],  # y- y+
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],  # z- z+
    ], np.int32)
    return Mesh(vertices=v, faces=f).with_generated_normals()


def test_smart_project_cube():
    mesh = smart_project(_box_mesh())
    assert mesh.uvs is not None
    assert mesh.uvs.min() >= 0.0 and mesh.uvs.max() <= 1.0
    assert len(mesh.faces) == 12
    # islands must not overlap: count coverage of strictly-interior cells
    # (adjacent islands can share boundary cells at this raster resolution)
    grid = np.zeros((64, 64), np.int32)
    for tri in mesh.faces:
        uv = mesh.uvs[tri]
        lo = np.ceil(uv.min(0) * 63 + 0.5).astype(int)
        hi = np.floor(uv.max(0) * 63 - 0.5).astype(int)
        grid[lo[1]:hi[1] + 1, lo[0]:hi[0] + 1] += 1
    # each interior cell covered at most by the two triangles of its island
    assert grid.max() <= 2


def test_smart_project_packing_quality():
    """The packer must actually fill the atlas: min-area-rect alignment +
    bisected FFDH shelf pack reach ~87% texel utilization on the demo room
    (tools/unwrap_metrics.py; the old PCA align packed the square floor as
    a 45-degree diamond and capped the whole atlas at ~23%)."""
    from stylemesh_tpu.data.demo_scene import room_mesh

    mesh = smart_project(room_mesh())
    uvs = np.asarray(mesh.uvs, np.float64)
    tri2 = uvs[np.asarray(mesh.faces)]
    a2 = 0.5 * np.abs(np.cross(tri2[:, 1] - tri2[:, 0],
                               tri2[:, 2] - tri2[:, 0]))
    assert uvs.min() >= 0.0 and uvs.max() <= 1.0
    assert a2.sum() > 0.80  # fraction of the unit square actually used
    # uniform texel density across islands (pure rigid pack, no stretch)
    tri3 = np.asarray(mesh.vertices, np.float64)[np.asarray(mesh.faces)]
    a3 = 0.5 * np.linalg.norm(np.cross(tri3[:, 1] - tri3[:, 0],
                                       tri3[:, 2] - tri3[:, 0]), axis=1)
    density = np.sqrt(a2 / a3)
    assert np.std(density / density.mean()) < 1e-5


def test_decimate_reduces_faces():
    rng = np.random.default_rng(0)
    # dense grid mesh (2*29*29 faces)
    n = 30
    ys, xs = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    z = 0.2 * np.sin(xs / 5.0) * np.cos(ys / 5.0)  # smooth height field
    v = np.stack([xs.ravel(), ys.ravel(), z.ravel()], -1).astype(np.float32)
    faces = []
    for r in range(n - 1):
        for c in range(n - 1):
            a = r * n + c
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    mesh = Mesh(vertices=v, faces=np.asarray(faces, np.int32)).with_generated_normals()
    out = decimate(mesh, max_faces=300)
    assert len(out.faces) <= 300
    assert len(out.faces) > 20
    assert out.normals is not None


def test_parse_house(tmp_path):
    house = """ASCII 1.0
H house1 - 2 1 0 0 1 1 0 0 0 0 0 0 0 0 0 0 0 0 0 0
L 0 0 lab 0 0 0 0 0 0 0 0 0 0 0 0 0 0
R 0 0 0 0 bedroom 1 2 3 0 0 0 1 1 1 2.5 0 0 0 0
P pano_a 0 0 0 1 1 1 0 0 0 0 0
I 0 0 img0 0 0 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1 50 0 32 0 50 24 0 0 1 64 48 1 1 1 0 0 0 0 0
I 0 0 img0 0 1 1 0 0 0 0 1 0 0 0 0 1 0 0 0 0 1 50 0 32 0 50 24 0 0 1 64 48 1 1 1 0 0 0 0 0
"""
    p = tmp_path / "house1.house"
    p.write_text(house)
    h = parse_house(str(p))
    assert h.name == "house1"
    assert len(h.regions) == 1
    assert h.regions[0].label == "bedroom"
    assert len(h.panoramas) == 1
    assert len(h.images) == 2
    img = h.images[0]
    assert img.width == 64 and img.height == 48
    np.testing.assert_allclose(img.intrinsics[0, 0], 50.0)
    assert img.color_filename == "img0_i0_0.jpg"
    assert len(h.region_images(0)) == 2


def test_segmentation_provider(tmp_path):
    mesh = _box_mesh()
    semseg = {"segGroups": [
        {"id": 0, "label": "wall", "segments": [0]},
        {"id": 1, "label": "chair", "segments": [1]},
    ]}
    vseg = {"segIndices": [0, 0, 0, 0, 1, 1, 1, 1]}
    (tmp_path / "a.semseg.json").write_text(json.dumps(semseg))
    (tmp_path / "a.vseg.json").write_text(json.dumps(vseg))
    sp = SegmentationProvider.load(tmp_path / "a.semseg.json",
                                   tmp_path / "a.vseg.json")
    ids = sp.vertex_object_ids()
    assert list(ids) == [0, 0, 0, 0, 1, 1, 1, 1]

    colored = sp.recolor_mesh(mesh, by="object")
    assert colored.colors is not None
    assert not np.allclose(colored.colors[0], colored.colors[4])

    split = split_mesh_at_object(mesh, ids, 1)
    # faces mixing object 0 and 1 corners are dropped
    kept_ids = ids[split.faces]
    mixed = (kept_ids != kept_ids[:, :1]).any(1) & (kept_ids == 1).any(1)
    assert not mixed.any()

    t = np.eye(4, dtype=np.float32)
    t[0, 3] = 2.0
    moved = move_object_vertices(mesh, ids, 1, t)
    np.testing.assert_allclose(moved.vertices[4, 0], mesh.vertices[4, 0] + 2.0)
    np.testing.assert_allclose(moved.vertices[0], mesh.vertices[0])


def test_blur_filter_roundtrip(tmp_path):
    import cv2

    scene = tmp_path / "scene"
    (scene / "color").mkdir(parents=True)
    (scene / "depth").mkdir()
    (scene / "pose").mkdir()
    rng = np.random.default_rng(0)
    sharp = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)  # high variance
    blurry = cv2.GaussianBlur(sharp, (31, 31), 12)
    Image.fromarray(sharp).save(scene / "color" / "0.jpg")
    Image.fromarray(blurry).save(scene / "color" / "1.jpg")
    for i in (0, 1):
        Image.fromarray(np.zeros((64, 64), np.uint8)).save(scene / "depth" / f"{i}.png")
        (scene / "pose" / f"{i}.txt").write_text("pose")
    filtered = filter_blurry(str(scene), threshold=150.0)
    assert filtered == ["1"]
    assert not (scene / "color" / "1.jpg").exists()
    assert (scene / "filtered" / "color" / "1.jpg").exists()
    assert (scene / "filtered" / "pose" / "1.txt").exists()
    n = undo_filter(str(scene))
    assert n == 3
    assert (scene / "color" / "1.jpg").exists()


def test_sens_roundtrip(tmp_path):
    """Write a synthetic v4 .sens and extract it."""
    import struct
    import zlib

    import cv2

    from stylemesh_tpu.data.sens import extract_sens

    h, w = 24, 32
    rng = np.random.default_rng(0)
    path = tmp_path / "scene.sens"
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"sensor"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        k = np.eye(4, dtype=np.float32)
        k[0, 0] = k[1, 1] = 30.0
        for _ in range(4):  # intr/extr color + depth
            f.write(k.tobytes())
        f.write(struct.pack("i", 2))  # jpeg
        f.write(struct.pack("i", 1))  # zlib_ushort
        f.write(struct.pack("I", w))
        f.write(struct.pack("I", h))
        f.write(struct.pack("I", w))
        f.write(struct.pack("I", h))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", 3))  # frames
        for i in range(3):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = i
            f.write(pose.tobytes())
            f.write(struct.pack("QQ", i, i))  # timestamps
            img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            ok, jpg = cv2.imencode(".jpg", img)
            depth = (rng.integers(500, 5000, (h, w)).astype(np.uint16))
            dz = zlib.compress(depth.tobytes())
            f.write(struct.pack("Q", len(jpg.tobytes())))
            f.write(struct.pack("Q", len(dz)))
            f.write(jpg.tobytes())
            f.write(dz)

    out = tmp_path / "scene0001_00"
    n = extract_sens(str(path), str(out), frame_skip=2, image_size=(12, 16))
    assert n == 2  # frames 0 and 2
    assert (out / "color" / "0.jpg").exists()
    assert (out / "depth" / "2.png").exists()
    assert (out / "pose" / "2.txt").exists()
    txt = (out / "scene0001_00.txt").read_text()
    assert "fx_color = 15.0" in txt  # 30 * 16/32
    d = np.asarray(Image.open(out / "depth" / "0.png"))
    assert d.dtype == np.uint16 or d.dtype == np.int32
    assert d.shape == (h, w)


def test_save_ply_roundtrip_and_create_uvs(tmp_path):
    from stylemesh_tpu.create_uvs import unwrap_mesh_file
    from stylemesh_tpu.geometry.mesh_io import load_ply, save_ply

    mesh = _box_mesh()
    raw = tmp_path / "scene_vh_clean.ply"
    save_ply(mesh, str(raw), binary=True)
    back = load_ply(str(raw))
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-6)
    np.testing.assert_array_equal(back.faces, mesh.faces)

    out = unwrap_mesh_file(str(raw), max_faces=1000)
    assert out.endswith("_uvs_blender.ply")
    unwrapped = load_ply(out)
    assert unwrapped.uvs is not None
    assert unwrapped.uvs.min() >= 0 and unwrapped.uvs.max() <= 1
    # idempotent: second call skips
    out2 = unwrap_mesh_file(str(raw), max_faces=1000)
    assert out2 == out


def test_smart_project_angle_limit_grouping():
    """Blender-parity semantics: faces within the 70-degree angle_limit share
    a projection group (one island if edge-connected); faces beyond it split
    (create_uvs.py smart_project(angle_limit=1.2217))."""
    import numpy as np

    from stylemesh_tpu.geometry.unwrap import _islands, _projection_groups

    def tent(angle_deg):
        # two triangles sharing edge (0,0,0)-(0,1,0); the second tilts by
        # angle_deg around that shared edge
        a = np.deg2rad(angle_deg)
        verts = np.asarray([
            [0, 0, 0], [0, 1, 0], [1, 0, 0],
            [np.cos(a) * -1.0, 0, np.sin(a)],
        ], np.float32)
        faces = np.asarray([[0, 2, 1], [0, 1, 3]], np.int64)
        return verts, faces

    v, f = tent(30.0)  # normals 30 deg apart -> same group
    g, _ = _projection_groups(v, f)
    assert g[0] == g[1]
    assert len(_islands(f, g)) == 1

    v, f = tent(90.0)  # normals 90 deg apart -> split
    g, _ = _projection_groups(v, f)
    assert g[0] != g[1]
    assert len(_islands(f, g)) == 2
