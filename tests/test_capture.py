"""Fly-camera capture CLI (stylemesh_tpu/capture.py) — the interactive twin
of the reference's WASD capture loop (renderer.cpp:268-375) + novel-pose uv
pyramid driver (main.cpp:80-140), driven here through its scripted-stdin
path (the CI contract: same key language, piped instead of typed)."""

import io
import os
import sys
from os.path import join

import numpy as np
import pytest

from stylemesh_tpu.capture import ansi_frame, fly, main, pose_from
from stylemesh_tpu.geometry.mesh_io import Mesh, save_ply


def _room_mesh():
    """A 4x4x2.5 m inward-facing box with per-vertex uvs (seam-free walls)."""
    lo, hi = np.array([-2.0, -2.0, -1.25]), np.array([2.0, 2.0, 1.25])
    corners = np.array([[x, y, z] for x in (lo[0], hi[0])
                        for y in (lo[1], hi[1]) for z in (lo[2], hi[2])],
                       np.float32)
    # 12 triangles, wound inward (viewer inside the box)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, c, d in quads:
        faces += [(a, b, c), (a, c, d)]
    uvs = (corners[:, :2] - lo[:2]) / (hi[:2] - lo[:2])
    return Mesh(vertices=corners, faces=np.asarray(faces, np.int32),
                uvs=uvs.astype(np.float32)).with_generated_normals()


K = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]], np.float32)


def test_pose_from_orthonormal_and_axes():
    m = pose_from(np.zeros(3), 0.0, 0.0)
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[:3, 2], [1, 0, 0], atol=1e-6)  # fwd = +x
    np.testing.assert_allclose(m[:3, 1], [0, 0, 1], atol=1e-6)  # down = +z
    # yaw 90deg turns fwd to +y; pitch>0 looks down (+z component)
    np.testing.assert_allclose(
        pose_from(np.zeros(3), np.pi / 2, 0.0)[:3, 2], [0, 1, 0], atol=1e-6)
    assert pose_from(np.zeros(3), 0.0, 0.3)[2, 2] > 0


def test_scripted_fly_moves_and_captures(monkeypatch):
    mesh = _room_mesh()
    monkeypatch.setattr(sys, "stdin", io.StringIO("c w w c l l s c x"))
    out = io.StringIO()
    captured = fly(mesh, K, (24, 32), start=(0.0, 0.0, 0.0), speed=0.5,
                   turn_deg=45.0, out=out, interactive=False)
    assert len(captured) == 3
    np.testing.assert_allclose(captured[0][:3, 3], [0, 0, 0], atol=1e-6)
    # two forward steps along +x fwd
    np.testing.assert_allclose(captured[1][:3, 3], [1.0, 0, 0], atol=1e-6)
    # 90deg yaw then one step back (-fwd = -y)
    np.testing.assert_allclose(captured[2][:3, 3], [1.0, -0.5, 0], atol=1e-5)
    np.testing.assert_allclose(captured[2][:3, 2], [0, 1, 0], atol=1e-6)
    # every redraw emitted a real frame + status line
    text = out.getvalue()
    assert text.count("captured") >= 9
    assert "▀" in text


def test_ansi_frame_shape_and_colors():
    img = np.zeros((4, 3, 3), np.uint8)
    img[0, :] = (255, 0, 0)
    s = ansi_frame(img)
    assert s.count("▀") == 6  # 4x3 pixels -> 2 rows of 3 half-block chars
    assert "38;2;255;0;0" in s and "48;2;0;0;0" in s


def test_main_orbit_bakes_uv_pyramid(tmp_path):
    mesh_path = str(tmp_path / "room.ply")
    save_ply(_room_mesh(), mesh_path)
    out = str(tmp_path / "novel")
    rc = main(["--mesh", mesh_path, "--out", out, "--base_hw", "24", "32",
               "--pyramid_heights", "16", "--fov", "70",
               "--orbit", "0", "0", "0", "1.0", "3"])
    assert rc == 0
    poses = sorted(os.listdir(join(out, "pose_novel")))
    assert poses == ["0.txt", "1.txt", "2.txt"]
    for i in range(3):
        uv3 = np.load(join(out, "uv", f"{i}.npy"))
        assert uv3.shape == (24, 32, 3)
        assert (uv3[..., :2].sum(-1) > 0).mean() > 0.5  # inside the room
        assert os.path.exists(join(out, "uv", f"{i}.angle.npy"))
        assert os.path.exists(join(out, "uv", f"{i}.rendered_depth.npy"))
        lvl = np.load(join(out, "uv_16", f"{i}.npy"))
        assert lvl.shape[0] == 16


def test_main_scripted_stdin_end_to_end(tmp_path, monkeypatch):
    mesh_path = str(tmp_path / "room.ply")
    save_ply(_room_mesh(), mesh_path)
    out = str(tmp_path / "novel")
    monkeypatch.setattr(sys, "stdin", io.StringIO("w c j j c x"))
    rc = main(["--mesh", mesh_path, "--out", out, "--base_hw", "24", "32",
               "--pyramid_heights", "16", "--preview_hw", "16", "22",
               "--no_bake"])
    assert rc == 0
    assert sorted(os.listdir(join(out, "pose_novel"))) == ["0.txt", "1.txt"]
    assert not os.path.isdir(join(out, "uv"))
