"""Pinhole un/re-projection.

Parity targets: ``unproject`` and ``reproject``
(/root/reference/data/utils.py:36-194) — used by the reprojection-
consistency evaluation (warp the styled image of one view into another using
depth + poses, mask occlusions by 4-corner depth agreement) and by the circle
metric's 2D->3D lifting.

Channel-last: images are ``[B, H, W, C]``; depths ``[B, H, W, 1]``.
"""

import jax.numpy as jnp

from stylemesh_tpu.ops.grid_sample import grid_sample, grid_sample_nearest


def _pixel_grid(h, w, dtype):
    xx = jnp.arange(w, dtype=dtype)[None, :].repeat(h, axis=0)
    yy = jnp.arange(h, dtype=dtype)[:, None].repeat(w, axis=1)
    return xx, yy


def unproject(cam2world, intrinsic, depth):
    """Depth map -> homogeneous world-space points ``[B, H, W, 4]``.

    Matches data/utils.py:36-70 including its row-vector convention:
    ``coords @ cam2world`` (the reference multiplies [x,y,z,1] as a row vector
    with the untransposed cam2world).
    """
    b, h, w, _ = depth.shape
    dtype = depth.dtype
    xx, yy = _pixel_grid(h, w, dtype)
    fx = intrinsic[:, 0, 0][:, None, None]
    fy = intrinsic[:, 1, 1][:, None, None]
    cx = intrinsic[:, 0, 2][:, None, None]
    cy = intrinsic[:, 1, 2][:, None, None]
    d = depth[..., 0]
    x = (xx[None] - cx) / fx * d
    y = (yy[None] - cy) / fy * d
    coords = jnp.stack([x, y, d, jnp.ones_like(d)], axis=-1)
    coords = jnp.einsum("bhwi,bij->bhwj", coords, cam2world)
    return coords


def reproject(cam2world_src, cam2world_tar, intrinsic, depth_src, depth_tar,
              color_tar, mask_tar, depth_agreement=0.1):
    """Warp ``color_tar`` into the src view; returns (warped, valid_mask).

    Matches data/utils.py:73-194: unproject src depth, transform src->tar,
    project with K, reject out-of-bounds / zero-depth pixels, and reject
    pixels whose reprojected depth disagrees with the target depth at all 4
    surrounding integer pixels by more than ``depth_agreement``.

    Args:
        color_tar: ``[B, H, W, C]``; depths ``[B, H, W, 1]``;
        mask_tar: ``[B, H, W, 1]`` (0/1).
    Returns:
        warped ``[B, H, W, C]`` (zeros where invalid), mask ``[B, H, W, 1]`` bool.
    """
    b, h, w, _ = color_tar.shape
    dtype = color_tar.dtype

    world2cam_tar = jnp.linalg.inv(cam2world_tar)
    # reference: src2tar = (world2cam_tar @ cam2world_src)^T, applied to row vecs
    src2tar = jnp.einsum("bij,bjk->bik", world2cam_tar, cam2world_src)
    src2tar = jnp.swapaxes(src2tar, 1, 2)

    xx, yy = _pixel_grid(h, w, dtype)
    fx = intrinsic[:, 0, 0][:, None, None]
    fy = intrinsic[:, 1, 1][:, None, None]
    cx = intrinsic[:, 0, 2][:, None, None]
    cy = intrinsic[:, 1, 2][:, None, None]

    d = depth_src[..., 0]
    x = (xx[None] - cx) / fx * d
    y = (yy[None] - cy) / fy * d
    coords = jnp.stack([x, y, d, jnp.ones_like(d)], axis=-1)
    coords = jnp.einsum("bhwi,bij->bhwj", coords, src2tar)

    z_tar = coords[..., 2]
    px = coords[..., 0] / (1e-8 + z_tar) * fx + cx
    py = coords[..., 1] / (1e-8 + z_tar) * fy + cy

    mask0 = d == 0
    mask1 = (px < 0) | (py < 0) | (px >= w - 1) | (py >= h - 1)

    lx, ly = jnp.floor(px), jnp.floor(py)
    rx, ry = lx + 1, ly + 1

    def to_grid(gx, gy):
        # reference make_grid: 2*x/W - 1 (NOT align_corners scaling)
        return jnp.stack([2.0 * gx / w - 1.0, 2.0 * gy / h - 1.0], axis=-1)

    corners = [to_grid(lx, ly), to_grid(lx, ry), to_grid(rx, ly), to_grid(rx, ry)]
    zt = z_tar[..., None]
    diffs = []
    for g in corners:
        sampled = jnp.stack([
            grid_sample_nearest(depth_tar[i], g[i]) for i in range(b)
        ])
        diffs.append(jnp.abs(zt - sampled))
    mask2 = jnp.minimum(jnp.minimum(diffs[0], diffs[1]),
                        jnp.minimum(diffs[2], diffs[3])) > depth_agreement
    mask2 = mask2[..., 0]

    mask_remap = (~(mask0 | mask1 | mask2)).astype(dtype)[..., None]

    warp_grid = to_grid(px, py)
    color_warp = jnp.stack([
        grid_sample(color_tar[i], warp_grid[i]) for i in range(b)
    ])
    mask_warp = jnp.stack([
        grid_sample(mask_tar[i].astype(dtype), warp_grid[i]) for i in range(b)
    ])
    valid = (mask_warp > 0.99) & (mask_remap > 0)
    color_warp = color_warp * valid.astype(dtype)
    return color_warp, valid
