"""Geometry tests: rasterizer analytic scenes + reprojection parity vs a
torch implementation of the reference warp."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from stylemesh_tpu.geometry.project import reproject, unproject
from stylemesh_tpu.geometry.rasterize import rasterize_mesh

RNG = np.random.default_rng(21)


# ------------------------------------------------------------- rasterizer


def _quad_scene(z=2.0, half=1.5):
    """Two triangles forming a square at depth z, facing the camera."""
    verts = np.array([
        [-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    normals = np.array([[0, 0, -1]] * 4, np.float32)
    return verts, faces, uvs, normals


def test_rasterize_frontal_quad():
    verts, faces, uvs, normals = _quad_scene(z=2.0, half=1.5)
    h, w = 32, 32
    k = np.array([[20.0, 0, 16.0], [0, 20.0, 16.0], [0, 0, 1]], np.float32)
    uv, ang, depth, hit, _ = rasterize_mesh(
        verts, faces, uvs, normals, np.eye(4, dtype=np.float32), k, (h, w))
    uv, ang, depth, hit = map(np.asarray, (uv, ang, depth, hit))

    cy = cx = 16
    assert hit[cy, cx]
    np.testing.assert_allclose(depth[cy, cx], 2.0, rtol=1e-5)
    # screen x=16.5 center -> world x = (16.5-16)/20*2 = 0.05 -> u = (0.05+1.5)/3
    np.testing.assert_allclose(uv[cy, cx, 0], (0.05 + 1.5) / 3.0, atol=1e-4)
    np.testing.assert_allclose(uv[cy, cx, 1], (0.05 + 1.5) / 3.0, atol=1e-4)
    # frontal quad: near-normal incidence at center
    assert ang[cy, cx] > 0.99
    # quad spans screen radius fx*half/z = 15 px around center: corners empty
    assert not hit[0, 0] and not hit[-1, -1]
    assert depth[0, 0] == 0.0 and uv[0, 0, 0] == 0.0

    # pixels further from center view the plane at a more grazing angle
    assert ang[cy, cx] > ang[cy + 10, cx + 10] > 0.0


def test_rasterize_occlusion():
    # two quads, the nearer one should win the z-test where they overlap
    v1, f1, u1, n1 = _quad_scene(z=2.0, half=0.5)
    v2, f2, u2, n2 = _quad_scene(z=4.0, half=2.0)
    verts = np.concatenate([v1, v2])
    faces = np.concatenate([f1, f2 + 4])
    uvs = np.concatenate([u1, u2 * 0.0 + 0.75])  # far quad has constant uv .75
    normals = np.concatenate([n1, n2])
    k = np.array([[20.0, 0, 16.0], [0, 20.0, 16.0], [0, 0, 1]], np.float32)
    uv, ang, depth, hit, _ = rasterize_mesh(
        verts, faces, uvs, normals, np.eye(4, dtype=np.float32), k, (32, 32))
    depth = np.asarray(depth)
    # near quad (half 0.5 @ z=2) spans ~5px around center; far quad
    # (half 2 @ z=4) spans ~10px.
    np.testing.assert_allclose(depth[16, 16], 2.0, rtol=1e-5)  # near quad wins
    np.testing.assert_allclose(depth[8, 16], 4.0, rtol=1e-5)  # only far quad
    np.testing.assert_allclose(np.asarray(uv)[8, 16, 0], 0.75, atol=1e-4)


def test_rasterize_translated_camera():
    verts, faces, uvs, normals = _quad_scene(z=3.0, half=2.0)
    cam = np.eye(4, dtype=np.float32)
    cam[0, 3] = 0.5  # camera shifted +x -> quad appears shifted -x
    k = np.array([[20.0, 0, 16.0], [0, 20.0, 16.0], [0, 0, 1]], np.float32)
    uv, ang, depth, hit, _ = rasterize_mesh(verts, faces, uvs, normals, cam, k, (32, 32))
    # center pixel ray hits world point (0.5+eps, eps, 3) -> u=(0.5..+2)/4
    x_world = 0.5 + 0.5 / 20.0 * 3.0
    np.testing.assert_allclose(np.asarray(uv)[16, 16, 0], (x_world + 2.0) / 4.0,
                               atol=1e-4)


# ------------------------------------------------------------- reprojection


def _torch_reproject(cam_src, cam_tar, W, H, K, d_src, d_tar, c_tar, m_tar):
    """Reference data/utils.py:73-194 semantics in torch (test oracle)."""
    bs = m_tar.shape[0]
    world2cam_tar = torch.inverse(cam_tar)
    src2tar = torch.transpose(torch.bmm(world2cam_tar, cam_src), 1, 2)
    y = torch.linspace(0, H - 1, H).int()
    x = torch.linspace(0, W - 1, W).int()
    xx, yy = torch.meshgrid(x, y, indexing="xy")
    xx = xx.repeat(bs, 1, 1).float()
    yy = yy.repeat(bs, 1, 1).float()
    fx = K[:, 0, 0].view(-1, 1, 1)
    cx = K[:, 0, 2].view(-1, 1, 1)
    fy = K[:, 1, 1].view(-1, 1, 1)
    cy = K[:, 1, 2].view(-1, 1, 1)
    d = d_src.squeeze(1)
    px = (xx - cx) / fx * d
    py = (yy - cy) / fy * d
    coords = torch.stack([px, py, d, torch.ones_like(d)], dim=-1)
    coords = torch.bmm(coords.view(bs, -1, 4), src2tar).view(bs, H, W, 4)
    z_tar = coords[..., 2]
    sx = coords[..., 0] / (1e-8 + z_tar) * fx + cx
    sy = coords[..., 1] / (1e-8 + z_tar) * fy + cy
    mask0 = d == 0
    mask1 = (sx < 0) | (sy < 0) | (sx >= W - 1) | (sy >= H - 1)
    lx, ly = torch.floor(sx), torch.floor(sy)
    rx, ry = lx + 1, ly + 1

    def grid(gx, gy):
        return torch.stack([2.0 * gx / W - 1.0, 2.0 * gy / H - 1.0], dim=3)

    zt = z_tar.unsqueeze(1)
    zs = []
    for g in [grid(lx, ly), grid(lx, ry), grid(rx, ly), grid(rx, ry)]:
        zs.append(torch.abs(zt - F.grid_sample(d_tar, g, mode="nearest",
                                               padding_mode="border",
                                               align_corners=True)))
    mask2 = (torch.minimum(torch.minimum(zs[0], zs[1]),
                           torch.minimum(zs[2], zs[3])) > 0.1).int().squeeze(1)
    mask_remap = (1 - ((mask0.int() + mask1.int() + mask2) > 0).int()).float().unsqueeze(1)
    warp = grid(sx, sy)
    color = F.grid_sample(c_tar, warp, mode="bilinear", padding_mode="border",
                          align_corners=True)
    m = F.grid_sample(m_tar.float().unsqueeze(1), warp, mode="bilinear",
                      padding_mode="border", align_corners=True)
    m = (m > 0.99) * mask_remap
    return color * m, m.bool()


def test_reproject_matches_torch():
    B, H, W = 1, 20, 26
    k = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    k[:, 0, 0] = k[:, 1, 1] = 25.0
    # off-center principal point: with cx=W/2 and an identity pose, border
    # pixels project to exactly 0.0 and the bound checks become knife-edge
    # sensitive to f32 summation order (einsum vs torch bmm)
    k[:, 0, 2] = W / 2.0 + 0.37
    k[:, 1, 2] = H / 2.0 - 0.23
    cam_src = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    cam_tar = cam_src.copy()
    cam_tar[:, 0, 3] = 0.15  # small lateral shift
    cam_tar[:, 1, 3] = -0.07
    d_src = (RNG.random((B, H, W, 1)).astype(np.float32) * 0.2 + 2.0)
    d_src[0, :2, :2, 0] = 0.0  # some invalid depth
    d_tar = d_src + RNG.normal(0, 0.02, (B, H, W, 1)).astype(np.float32)
    c_tar = RNG.random((B, H, W, 3)).astype(np.float32)
    m_tar = (RNG.random((B, H, W, 1)) > 0.1).astype(np.float32)

    ours_c, ours_m = reproject(
        jnp.asarray(cam_src), jnp.asarray(cam_tar), jnp.asarray(k),
        jnp.asarray(d_src), jnp.asarray(d_tar), jnp.asarray(c_tar),
        jnp.asarray(m_tar))

    t = lambda x: torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    ref_c, ref_m = _torch_reproject(
        torch.from_numpy(cam_src), torch.from_numpy(cam_tar), W, H,
        torch.from_numpy(k), t(d_src), t(d_tar), t(c_tar),
        torch.from_numpy(m_tar[..., 0]))

    np.testing.assert_allclose(np.asarray(ours_m)[..., 0],
                               ref_m.squeeze(1).numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(ours_c),
                               np.moveaxis(ref_c.numpy(), 1, -1), atol=1e-4)


def test_unproject_roundtrip():
    B, H, W = 1, 8, 10
    k = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    k[:, 0, 0] = k[:, 1, 1] = 12.0
    k[:, 0, 2] = W / 2.0
    k[:, 1, 2] = H / 2.0
    cam = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    depth = np.full((B, H, W, 1), 3.0, np.float32)
    pts = np.asarray(unproject(jnp.asarray(cam), jnp.asarray(k), jnp.asarray(depth)))
    # center pixel maps to (0, 0, 3)
    np.testing.assert_allclose(pts[0, 4, 5], [0, 0, 3, 1], atol=1e-5)
    # re-project: x/z*fx+cx == pixel x
    x = pts[0, 2, 7, 0] / pts[0, 2, 7, 2] * 12.0 + 5.0
    np.testing.assert_allclose(x, 7.0, atol=1e-5)
