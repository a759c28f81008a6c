"""Native C++ rasterizer parity vs the JAX rasterizer + textured render."""

import numpy as np
import pytest

from stylemesh_tpu.geometry.rasterize import rasterize_mesh

native = pytest.importorskip("stylemesh_tpu.geometry.native")


def _scene():
    rng = np.random.default_rng(3)
    # a little "room": two quads at different depths + a slanted one
    verts, faces, uvs = [], [], []
    quads = [
        ((-1.5, -1.5, 3.0), (1.5, 1.5, 3.0)),  # back wall
        ((-2.0, -0.2, 1.5), (0.2, 2.0, 2.2)),  # slanted panel
    ]
    for qi, ((x0, y0, z0), (x1, y1, z1)) in enumerate(quads):
        base = len(verts)
        verts += [(x0, y0, z0), (x1, y0, (z0 + z1) / 2), (x1, y1, z1), (x0, y1, (z0 + z1) / 2)]
        u0 = 0.5 * qi
        uvs += [(u0, 0), (u0 + 0.4, 0), (u0 + 0.4, 0.9), (u0, 0.9)]
        faces += [(base, base + 1, base + 2), (base, base + 2, base + 3)]
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    uvs = np.asarray(uvs, np.float32)
    # flat normals per quad (approximate; same input to both rasterizers)
    normals = np.tile(np.asarray([0, 0, -1], np.float32), (len(verts), 1))
    cam = np.eye(4, dtype=np.float32)
    cam[0, 3] = 0.1
    k = np.array([[40.0, 0, 32.0], [0, 40.0, 24.0], [0, 0, 1]], np.float32)
    return verts, faces, uvs, normals, cam, k


def test_native_matches_jax_rasterizer():
    verts, faces, uvs, normals, cam, k = _scene()
    hw = (48, 64)
    uv_j, ang_j, d_j, hit_j = [np.asarray(x) for x in
                               rasterize_mesh(verts, faces, uvs, normals, cam, k, hw)]
    uv_n, ang_n, d_n, hit_n = native.rasterize_mesh_native(
        verts, faces, uvs, normals, cam, k, hw)

    agree = hit_j == hit_n
    # edge pixels may differ by sub-pixel rounding; demand 99% agreement
    assert agree.mean() > 0.99, agree.mean()
    both = hit_j & hit_n
    assert both.sum() > 500  # scene actually covers a good chunk
    np.testing.assert_allclose(d_n[both], d_j[both], rtol=1e-4)
    np.testing.assert_allclose(uv_n[both], uv_j[both], atol=1e-4)
    np.testing.assert_allclose(ang_n[both], ang_j[both], atol=1e-3)


def test_native_textured_render():
    verts, faces, uvs, normals, cam, k = _scene()
    tex = np.zeros((64, 64, 3), np.float32)
    tex[:, :, 0] = 1.0  # red texture
    img = native.render_textured_native(verts, faces, uvs, normals, cam, k,
                                        (48, 64), tex, shading=True)
    assert img.shape == (48, 64, 3)
    covered = img.sum(-1) > 0
    assert covered.sum() > 500
    # shading: ambient 0.7 + diffuse, red channel in [0.7, 1]
    reds = img[..., 0][covered]
    assert reds.min() >= 0.69 and reds.max() <= 1.0
    assert (img[..., 1][covered] == 0).all()
