"""Novel-pose trajectory synthesis (geometry/trajectories.py) — the headless
replacement for the reference's interactive WASD fly-cam capture
(renderer.cpp:268-375): keyframe slerp paths, inward-looking orbits, and the
pose/<i>.txt export contract consumed by bake_scene."""

import numpy as np

from stylemesh_tpu.data.loading import load_extrinsics
from stylemesh_tpu.geometry.trajectories import (
    interpolate_poses,
    orbit_poses,
    write_pose_dir,
)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    m[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    return m


def _assert_se3(m):
    r = m[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) > 0.99
    np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-7)


def test_interpolate_poses_endpoints_and_smoothness():
    a = _rot_z(0.0)
    b = _rot_z(np.pi / 2)
    b[:3, 3] = [1.0, 2.0, 3.0]
    path = interpolate_poses([a, b], steps_per_segment=10)
    assert len(path) == 11
    np.testing.assert_allclose(path[0], a, atol=1e-6)
    np.testing.assert_allclose(path[-1], b, atol=1e-6)
    for m in path:
        _assert_se3(np.asarray(m, np.float64))
    # translation is an exact lerp; rotation angle advances monotonically
    np.testing.assert_allclose(path[5][:3, 3], 0.5 * b[:3, 3], atol=1e-6)
    angles = [np.arctan2(m[1, 0], m[0, 0]) for m in path]
    assert np.all(np.diff(angles) > 0)
    # slerp at the midpoint bisects the rotation
    np.testing.assert_allclose(angles[5], np.pi / 4, atol=1e-6)


def test_orbit_poses_look_at_center():
    center = np.array([1.0, -2.0, 1.5])
    poses = orbit_poses(center, radius=2.0, height=0.5, n=12)
    assert len(poses) == 12
    for m in poses:
        m = np.asarray(m, np.float64)
        _assert_se3(m)
        eye, fwd = m[:3, 3], m[:3, 2]
        np.testing.assert_allclose(np.linalg.norm(eye - center),
                                   np.sqrt(2.0 ** 2 + 0.5 ** 2), rtol=1e-6)
        # +z column points from the eye at the look-at target
        to_center = center - eye
        np.testing.assert_allclose(to_center / np.linalg.norm(to_center),
                                   fwd, atol=1e-6)
    # distinct azimuths all the way around
    eyes = np.stack([p[:3, 3] for p in poses])
    assert np.unique(np.round(eyes, 4), axis=0).shape[0] == 12


def test_write_pose_dir_roundtrip(tmp_path):
    poses = orbit_poses((0.0, 0.0, 1.0), radius=1.0, height=0.0, n=3)
    out = write_pose_dir(poses, str(tmp_path / "pose"))
    for i, p in enumerate(poses):
        loaded = load_extrinsics(f"{out}/{i}.txt")
        np.testing.assert_allclose(loaded, p, rtol=1e-6)
