"""Host-side planning for the Pallas splat (texture-gradient) kernel.

The backward of bilinear texture sampling is a scatter-add of 4-corner
weighted pixel gradients into the atlas. XLA's TPU scatter costs ~90ns/index
(measured: 580ms for one 2x784x1045 level into 4096² — the dominant cost of
the whole train step). Because UV maps are *constants per scene*, we can plan
a fast path offline:

- pixels are processed in fixed tiles (TILE_H x TILE_W);
- UV smoothness means a pixel tile's 4-corner footprint usually fits a small
  texel region; the planner computes each tile's region origin;
- tiles whose footprint exceeds the region (UV island seams) have their
  contributions routed to a compact *residual* scatter list (a small XLA
  scatter), while the kernel zero-weights them via the same in-region test.

The plan is computed once per (view, pyramid level, texture layer) at scene-
cache build time and sliced per batch.
"""

import dataclasses
from typing import NamedTuple, Tuple

import numpy as np


class PlanArrays(NamedTuple):
    """Device-side splat plan for one (level, texture-layer) pair, batched
    over views (a jax pytree carried inside the ViewBatch)."""

    origins: "np.ndarray"  # [V * n_tiles_per_view, 2] int32 (primary window)
    origins2: "np.ndarray"  # [V * n_tiles_per_view, 2] int32 (seam window)
    has2: "np.ndarray"  # [V * n_tiles_per_view] int32 0/1
    res_texel: "np.ndarray"  # [V, cap] int32
    res_pixel: "np.ndarray"  # [V, cap] int32
    res_weight: "np.ndarray"  # [V, cap] f32

TILE_H = 16
TILE_W = 64
TILE_PX = TILE_H * TILE_W
# texel region per tile (static kernel shape): covers ~4 texels/pixel plus
# bilinear margin and the (8, 128) origin-alignment slack at the bench's
# 4096-atlas / 1045-px-view scale
REGION_H = 128
REGION_W = 512
# HBM window DMA origins must sit on the (sublane, lane) tile grid
ALIGN_H = 8
ALIGN_W = 128


def effective_region(tex_h, tex_w, region_h=None, region_w=None):
    """Window size clamped to the atlas (small layers use the whole atlas)."""
    rh = min(region_h or REGION_H, tex_h)
    rw = min(region_w or REGION_W, tex_w)
    return rh, rw


def _corner_data(uv, tex_h, tex_w):
    """f32 corner indices/weights for a [*, 2] uv grid (matches
    ops.grid_sample._corner_indices_weights numerics)."""
    px = (uv[..., 0].astype(np.float32) + 1.0) * 0.5 * (tex_w - 1)
    py = (uv[..., 1].astype(np.float32) + 1.0) * 0.5 * (tex_h - 1)
    px = np.clip(px, 0.0, tex_w - 1)
    py = np.clip(py, 0.0, tex_h - 1)
    ix0 = np.floor(px).astype(np.int32)
    iy0 = np.floor(py).astype(np.int32)
    ix1 = np.minimum(ix0 + 1, tex_w - 1)
    iy1 = np.minimum(iy0 + 1, tex_h - 1)
    wx1 = (px - ix0).astype(np.float32)
    wy1 = (py - iy0).astype(np.float32)
    return iy0, iy1, ix0, ix1, wy1, wx1


def _pad_to_tiles(arr, tile_h, tile_w, fill):
    h, w = arr.shape[:2]
    ph = (-h) % tile_h
    pw = (-w) % tile_w
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
        arr = np.pad(arr, pad, constant_values=fill)
    return arr


def tile_uv(uv):
    """[H, W, 2] -> [n_tiles, TILE_PX, 2] (padded pixels get uv = -10, which
    fails every in-region test and has zero planned weight)."""
    uvp = _pad_to_tiles(uv, TILE_H, TILE_W, -10.0)
    hh, ww = uvp.shape[:2]
    t = uvp.reshape(hh // TILE_H, TILE_H, ww // TILE_W, TILE_W, 2)
    return t.transpose(0, 2, 1, 3, 4).reshape(-1, TILE_PX, 2)


@dataclasses.dataclass
class SplatPlan:
    """Per (view, level, layer) fast-path plan."""

    tex_hw: Tuple[int, int]
    image_hw: Tuple[int, int]  # unpadded pixel grid
    origins: np.ndarray  # [n_tiles, 2] int32 primary window origin (y, x)
    origins2: np.ndarray  # [n_tiles, 2] int32 secondary (seam) window origin
    has2: np.ndarray  # [n_tiles] int32 0/1 — tile has a secondary window
    uv_tiles: np.ndarray  # [n_tiles, TILE_PX, 2] f32
    # residual scatter (contributions outside their tile's region)
    res_texel: np.ndarray  # [cap] int32 flat texel index
    res_pixel: np.ndarray  # [cap] int32 flat pixel index (into H*W)
    res_weight: np.ndarray  # [cap] f32 (0 for padding)
    res_count: int

    @property
    def n_tiles(self):
        return self.origins.shape[0]


def plan_splat(uv, tex_h, tex_w, region_h=None, region_w=None):
    """Build the splat plan for one view's [H, W, 2] uv grid."""
    region_h, region_w = effective_region(tex_h, tex_w, region_h, region_w)
    h, w = uv.shape[:2]
    uv_tiles = tile_uv(np.asarray(uv, np.float32))
    n_tiles = uv_tiles.shape[0]

    iy0, iy1, ix0, ix1, wy1, wx1 = _corner_data(uv_tiles, tex_h, tex_w)
    # padded pixels excluded entirely; background pixels (baked uv exactly 0
    # -> grid exactly (-1,-1) -> texel (0,0) with weight 1) are handled
    # analytically by the kernels (a dense masked sum / broadcast), so they
    # must not pollute the window bbox nor the residual lists
    valid = uv_tiles[..., 0] > -5.0
    background = (uv_tiles[..., 0] == -1.0) & (uv_tiles[..., 1] == -1.0)
    valid = valid & ~background

    # region origin: if the tile's content bbox fits the window, anchor at
    # its min; otherwise (island seams) center on the median so the majority
    # side stays in-window. Tile-grid-aligned, clamped into the atlas.
    def plan_axis(i0, size, region, align):
        lo = np.min(np.where(valid, i0, size - 1), axis=1)
        hi = np.max(np.where(valid, i0, 0), axis=1)
        med = np.median(np.where(valid, i0.astype(np.float64), np.nan), axis=1)
        med = np.nan_to_num(med, nan=0.0)
        fits = (hi - lo) <= (region - align - 2)
        o = np.where(fits, lo, np.maximum(med - region // 2, 0)).astype(np.int64)
        o = (o // align) * align
        return np.clip(o, 0, max(size - region, 0)).astype(np.int32)

    # np.median with all-NaN rows warns; suppress (pure-background tiles)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        oy = plan_axis(iy0, tex_h, region_h, ALIGN_H)
        ox = plan_axis(ix0, tex_w, region_w, ALIGN_W)
    origins = np.stack([oy, ox], axis=1)

    # in-window test per corner contribution (kernels replicate this exactly)
    def in_window(iy, ix, wy, wx):
        return ((iy >= wy[:, None]) & (iy < wy[:, None] + region_h)
                & (ix >= wx[:, None]) & (ix < wx[:, None] + region_w) & valid)

    corners = [
        (iy0, ix0, (1 - wy1) * (1 - wx1)),
        (iy0, ix1, (1 - wy1) * wx1),
        (iy1, ix0, wy1 * (1 - wx1)),
        (iy1, ix1, wy1 * wx1),
    ]

    # secondary window for island-seam tiles: plan over the corner
    # contributions the primary window missed
    out1 = [valid & ~in_window(iy, ix, oy, ox) for iy, ix, _ in corners]
    any_out = np.zeros((n_tiles, TILE_PX), bool)
    lo_y = np.full((n_tiles,), tex_h - 1, np.int64)
    lo_x = np.full((n_tiles,), tex_w - 1, np.int64)
    for (iy, ix, _), o in zip(corners, out1):
        any_out |= o
        lo_y = np.minimum(lo_y, np.min(np.where(o, iy, tex_h - 1), axis=1))
        lo_x = np.minimum(lo_x, np.min(np.where(o, ix, tex_w - 1), axis=1))
    has2 = any_out.any(axis=1).astype(np.int32)
    oy2 = np.clip((lo_y // ALIGN_H) * ALIGN_H, 0,
                  max(tex_h - region_h, 0)).astype(np.int32)
    ox2 = np.clip((lo_x // ALIGN_W) * ALIGN_W, 0,
                  max(tex_w - region_w, 0)).astype(np.int32)
    oy2 = np.where(has2 > 0, oy2, 0).astype(np.int32)
    ox2 = np.where(has2 > 0, ox2, 0).astype(np.int32)
    origins2 = np.stack([oy2, ox2], axis=1)

    # residuals: contributions of valid pixels falling outside the region
    res_t, res_p, res_w = [], [], []
    # map tiled pixel positions back to flat unpadded pixel indices
    hh = -(-h // TILE_H) * TILE_H
    ww = -(-w // TILE_W) * TILE_W
    t_rows = np.arange(n_tiles) // (ww // TILE_W)
    t_cols = np.arange(n_tiles) % (ww // TILE_W)
    in_tile = np.arange(TILE_PX)
    py_img = t_rows[:, None] * TILE_H + in_tile[None] // TILE_W
    px_img = t_cols[:, None] * TILE_W + in_tile[None] % TILE_W
    pix_flat = py_img * w + px_img  # valid only where px_img < w, py_img < h

    for (iy, ix, wgt), o1 in zip(corners, out1):
        # residual = outside the primary AND the secondary window
        out = o1 & ~in_window(iy, ix, oy2, ox2)
        if out.any():
            sel = np.nonzero(out)
            res_t.append((iy[sel] * tex_w + ix[sel]).astype(np.int32))
            res_p.append(pix_flat[sel].astype(np.int32))
            res_w.append(wgt[sel].astype(np.float32))

    if res_t:
        res_texel = np.concatenate(res_t)
        res_pixel = np.concatenate(res_p)
        res_weight = np.concatenate(res_w)
    else:
        res_texel = np.zeros((0,), np.int32)
        res_pixel = np.zeros((0,), np.int32)
        res_weight = np.zeros((0,), np.float32)
    return SplatPlan(
        tex_hw=(tex_h, tex_w), image_hw=(h, w), origins=origins,
        origins2=origins2, has2=has2,
        uv_tiles=uv_tiles, res_texel=res_texel, res_pixel=res_pixel,
        res_weight=res_weight, res_count=len(res_texel))


def plan_arrays_for_views(uv_views, tex_h, tex_w, cap=None,
                          region_h=None, region_w=None) -> PlanArrays:
    """Batched plan for ``uv_views [V, H, W, 2]`` (numpy)."""
    plans = [plan_splat(np.asarray(uv_views[i]), tex_h, tex_w,
                        region_h, region_w)
             for i in range(uv_views.shape[0])]
    origins = np.concatenate([p.origins for p in plans])
    origins2 = np.concatenate([p.origins2 for p in plans])
    has2 = np.concatenate([p.has2 for p in plans])
    rt, rp, rw = pad_residuals(plans, cap=cap)
    return PlanArrays(origins=origins, origins2=origins2, has2=has2,
                      res_texel=rt, res_pixel=rp,
                      res_weight=rw)


def pad_residuals(plans, cap=None):
    """Pad a list of per-view plans' residuals to a common static cap.
    Returns stacked (texel [V, cap], pixel [V, cap], weight [V, cap])."""
    counts = [p.res_count for p in plans]
    if cap is None:
        cap = max(1, max(counts))
        cap = int(2 ** np.ceil(np.log2(cap)))  # stable across similar batches
    t = np.zeros((len(plans), cap), np.int32)
    px = np.zeros((len(plans), cap), np.int32)
    w = np.zeros((len(plans), cap), np.float32)
    for i, p in enumerate(plans):
        n = min(p.res_count, cap)
        if p.res_count > cap:
            raise ValueError(f"residual cap {cap} < count {p.res_count}")
        t[i, :n] = p.res_texel[:n]
        px[i, :n] = p.res_pixel[:n]
        w[i, :n] = p.res_weight[:n]
    return t, px, w
