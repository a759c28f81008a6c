"""Host-side planning for the Pallas texture gather/splat kernels.

The backward of bilinear texture sampling is a scatter-add of 4-corner
weighted pixel gradients into the atlas; XLA's TPU scatter costs ~90ns/index
(measured: 580ms for one 2x784x1045 level into 4096² — it dominated the
training step). Because UV maps are *constants per scene*, a fast path is
planned offline per (view, pyramid level, texture layer):

- pixels are processed in fixed tiles (``tile_h x tile_w``);
- UV smoothness means a pixel tile's 4-corner footprint usually fits a small
  texel window; the planner sizes the window **per (level, layer)** from the
  actual footprint distribution (a cost model trades window area — the MXU
  matmul cost is proportional to it — against seam-tile overflow);
- tiles are *sorted by window origin* and consecutive tiles sharing a window
  are grouped: the kernel loads/stores the window once per group;
- tiles whose footprint exceeds the window (UV island seams) get a secondary
  window (scheduled as singleton groups in the splat); leftovers go to a
  compact XLA residual scatter;
- tiles whose gradient is provably zero (outside the UV mask, or zeroed by
  the angle/depth gradient weights — see
  :func:`stylemesh_tpu.data.grad_masks.grad_weight_masks`) are dropped from
  the splat schedule entirely, and background-only tiles are skipped in the
  gather.

The plan is computed once per (view, level, layer) at scene-cache build time
and reused every step the view batch is sampled (``--index_repeat`` in the
reference is 4..100, so plans amortize heavily).
"""

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import numpy as np

# defaults (legacy v1 values; the planner normally sizes per (level, layer))
TILE_H = 16
TILE_W = 64
TILE_PX = TILE_H * TILE_W
REGION_H = 128
REGION_W = 512
# HBM window DMA origins must sit on the (sublane, lane) tile grid
ALIGN_H = 8
ALIGN_W = 128
# VMEM budget for the two window scratch buffers (3 channels, f32, x2)
_MAX_REGION_TEXELS = 256 * 1024
# splat schedules are padded to multiples of this (fewer recompiles across
# batches with different live-tile counts)
_SPLAT_BUCKET = 64


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "g_ids", "g_oy", "g_ox", "g_load", "g_alive", "g_oy2", "g_ox2",
        "g_has2", "s_ids", "s_oy", "s_ox", "s_load", "s_store", "s_alive",
        "s_oy2", "s_ox2", "s_has2", "res_texel", "res_pixel", "res_weight",
    ],
    meta_fields=["tile_h", "tile_w", "region_h", "region_w", "tex_h_global"],
)
@dataclasses.dataclass(frozen=True)
class PlanArrays:
    """Device-side plan for one (level, texture-layer) pair, batched over
    views. All schedule arrays are ``[V, n]`` with per-view-LOCAL tile ids so
    the view axis shards cleanly; wrappers flatten and add view offsets.

    Gather schedule (all tiles, sorted by window origin):
      g_ids[v, i]   tile id processed at grid step i of view v
      g_oy/g_ox     primary window origin
      g_load        1 = DMA the window (first tile of a window run)
      g_alive       0 = tile has no valid non-background pixel (skip, zero out)
      g_oy2/g_ox2/g_has2  secondary (island-seam) window

    Splat schedule (live tiles only, padded to a bucket):
      s_ids/s_oy/s_ox     as above
      s_load/s_store      window run boundaries (load at start, store at end)
      s_alive             0 = padding
      s_oy2/s_ox2/s_has2  seam window (seam tiles are singleton runs)

    Residual scatter (contributions outside both windows): res_texel /
    res_pixel / res_weight ``[V, cap]``.

    Static meta: tile_h/tile_w (pixel tiling) and region_h/region_w (window).
    """

    g_ids: np.ndarray
    g_oy: np.ndarray
    g_ox: np.ndarray
    g_load: np.ndarray
    g_alive: np.ndarray
    g_oy2: np.ndarray
    g_ox2: np.ndarray
    g_has2: np.ndarray
    s_ids: np.ndarray
    s_oy: np.ndarray
    s_ox: np.ndarray
    s_load: np.ndarray
    s_store: np.ndarray
    s_alive: np.ndarray
    s_oy2: np.ndarray
    s_ox2: np.ndarray
    s_has2: np.ndarray
    res_texel: np.ndarray
    res_pixel: np.ndarray
    res_weight: np.ndarray
    tile_h: int = TILE_H
    tile_w: int = TILE_W
    region_h: int = REGION_H
    region_w: int = REGION_W
    # atlas-sharded (banded) plans: the FULL atlas height the uv->texel
    # mapping is computed against (window origins stay global; the kernels
    # subtract the chip's band row offset for the DMA). 0 = unbanded.
    tex_h_global: int = 0

    @property
    def tile_px(self):
        return self.tile_h * self.tile_w


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


def tile_uv(uv, tile_h=TILE_H, tile_w=TILE_W):
    """[H, W, 2] -> [n_tiles, tile_px, 2] (padded pixels get uv = -10, which
    fails every in-region test and has zero planned weight)."""
    uvp = _pad_to_tiles(uv, tile_h, tile_w, -10.0)
    hh, ww = uvp.shape[:2]
    t = uvp.reshape(hh // tile_h, tile_h, ww // tile_w, tile_w, 2)
    return t.transpose(0, 2, 1, 3, 4).reshape(-1, tile_h * tile_w, 2)


def _roundup(x, m):
    return int(-(-int(x) // m) * m)


def choose_region(uv_views, tex_h, tex_w, tile_h=TILE_H, tile_w=TILE_W,
                  max_region_h=None):
    """Size the texel window for this (level, layer) from the footprint
    distribution over all views' tiles.

    Cost model per tile: the kernel's MXU/VPU work is proportional to the
    window area; a tile whose footprint misses the window pays ~4x (the
    secondary window runs a per-corner loop). Alignment slack: origins are
    floored to (8, 128), so the window must cover bbox + align + 2.
    """
    fh_all, fw_all = [], []
    for v in range(uv_views.shape[0]):
        uvt = tile_uv(np.asarray(uv_views[v], np.float32), tile_h, tile_w)
        iy0, _, ix0, _, _, _ = _corner_data(uvt, tex_h, tex_w)
        valid = ((uvt[..., 0] > -5.0)
                 & ~((uvt[..., 0] == -1.0) & (uvt[..., 1] == -1.0)))
        any_valid = valid.any(axis=1)
        if not any_valid.any():
            continue
        lo_y = np.min(np.where(valid, iy0, tex_h), axis=1)
        hi_y = np.max(np.where(valid, iy0, -1), axis=1)
        lo_x = np.min(np.where(valid, ix0, tex_w), axis=1)
        hi_x = np.max(np.where(valid, ix0, -1), axis=1)
        fh_all.append((hi_y - lo_y)[any_valid])
        fw_all.append((hi_x - lo_x)[any_valid])
    if not fh_all:
        return min(64, _roundup(tex_h, ALIGN_H)), min(128, _roundup(tex_w, ALIGN_W))
    fh = np.concatenate(fh_all).astype(np.int64)
    fw = np.concatenate(fw_all).astype(np.int64)

    def clamp_hw(need_h, need_w):
        rh = min(_roundup(max(need_h, 8), ALIGN_H), tex_h, max_region_h or tex_h)
        rw = min(_roundup(max(need_w, 128), ALIGN_W), tex_w)
        # VMEM cap: shrink the larger axis until the window fits the budget
        while rh * rw > _MAX_REGION_TEXELS:
            if rw >= 2 * ALIGN_W and rw >= rh:
                rw -= ALIGN_W
            elif rh > ALIGN_H:
                rh -= ALIGN_H
            else:
                break
        return rh, rw

    best = None
    for q in (1.0, 0.99, 0.95, 0.85):
        need_h = int(np.quantile(fh, q)) + ALIGN_H + 2
        need_w = int(np.quantile(fw, q)) + ALIGN_W + 2
        rh, rw = clamp_hw(need_h, need_w)
        fits = (fh <= rh - ALIGN_H - 2) & (fw <= rw - ALIGN_W - 2)
        # seam tiles cost ~4x the window work (per-corner secondary pass)
        cost = rh * rw * (fits.size + 3 * int((~fits).sum()))
        if best is None or cost < best[0]:
            best = (cost, rh, rw)
    return best[1], best[2]


def _plan_view(uv, tex_h, tex_w, tile_h, tile_w, region_h, region_w,
               weight_mask=None, row_range=None, owner_mask=None):
    """Plan one view. Returns a dict of per-tile schedule data + residuals.

    ``row_range=(r0, r1)`` confines windows to an atlas row band (atlas
    sharding: each chip owns a band, windows never cross it); ``owner_mask``
    marks the tiles this band processes — other tiles are treated as fully
    invalid here (another band's plan covers them)."""
    h, w = uv.shape[:2]
    uv_tiles = tile_uv(np.asarray(uv, np.float32), tile_h, tile_w)
    n_tiles, tile_px = uv_tiles.shape[0], tile_h * tile_w

    iy0, iy1, ix0, ix1, wy1, wx1 = _corner_data(uv_tiles, tex_h, tex_w)
    # padded pixels excluded entirely; background pixels (baked uv exactly 0
    # -> grid exactly (-1,-1) -> texel (0,0) with weight 1) are handled
    # analytically by the wrappers, so they must not pollute the window bbox
    # nor the residual lists
    valid = uv_tiles[..., 0] > -5.0
    background = (uv_tiles[..., 0] == -1.0) & (uv_tiles[..., 1] == -1.0)
    valid = valid & ~background
    if owner_mask is not None:
        valid = valid & owner_mask[:, None]
    alive = valid.any(axis=1)
    r0, r1 = row_range if row_range is not None else (0, tex_h)

    # splat-liveness: gradient provably zero -> drop from the splat schedule
    if weight_mask is not None:
        wm = _pad_to_tiles(np.asarray(weight_mask, bool).reshape(h, w, 1),
                           tile_h, tile_w, False)
        hh, ww = wm.shape[:2]
        wm = wm.reshape(hh // tile_h, tile_h, ww // tile_w, tile_w)
        wm = wm.transpose(0, 2, 1, 3).reshape(-1, tile_px)
        s_alive = (valid & wm).any(axis=1)
    else:
        s_alive = alive.copy()

    # primary window origin, in preference order:
    # 1. coarse anchor — footprint min snapped DOWN to a half-region grid, if
    #    the footprint still fits: nearby tiles then share identical windows
    #    and the kernel loads/stores each shared window once per run;
    # 2. fine anchor — min snapped to the (8, 128) DMA alignment;
    # 3. island seams (footprint exceeds the window) — centered on the
    #    median so the majority side stays in-window.
    def plan_axis(i0, size, region, align, lo_lim=0, hi_lim=None):
        hi_lim = size if hi_lim is None else hi_lim
        lo = np.min(np.where(valid, i0, size - 1), axis=1)
        med = np.nanmedian(
            np.where(valid, i0.astype(np.float64), np.nan), axis=1)
        med = np.nan_to_num(med, nan=float(lo_lim))
        hi = np.max(np.where(valid, i0, 0), axis=1)
        coarse = max(align, (region // 2 // align) * align)
        o_coarse = (lo // coarse) * coarse
        # the in-window test is i < o + region and the i1 corner is i0 + 1
        fits_coarse = (hi - o_coarse) <= (region - 2)
        fits_fine = (hi - lo) <= (region - align - 2)
        o_fine = (lo // align) * align
        o_med = ((np.maximum(med - region // 2, 0)).astype(np.int64)
                 // align) * align
        o = np.where(fits_coarse, o_coarse, np.where(fits_fine, o_fine, o_med))
        return np.clip(o, lo_lim, max(hi_lim - region, lo_lim)).astype(np.int32)

    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        oy = plan_axis(iy0, tex_h, region_h, ALIGN_H, r0, r1)
        ox = plan_axis(ix0, tex_w, region_w, ALIGN_W)

    def in_window(iy, ix, wy, wx):
        return ((iy >= wy[:, None]) & (iy < wy[:, None] + region_h)
                & (ix >= wx[:, None]) & (ix < wx[:, None] + region_w) & valid)

    corners = [
        (iy0, ix0, (1 - wy1) * (1 - wx1)),
        (iy0, ix1, (1 - wy1) * wx1),
        (iy1, ix0, wy1 * (1 - wx1)),
        (iy1, ix1, wy1 * wx1),
    ]

    # secondary window over the corner contributions the primary missed
    out1 = [valid & ~in_window(iy, ix, oy, ox) for iy, ix, _ in corners]
    any_out = np.zeros((n_tiles, tile_px), bool)
    lo_y = np.full((n_tiles,), tex_h - 1, np.int64)
    lo_x = np.full((n_tiles,), tex_w - 1, np.int64)
    for (iy, ix, _), o in zip(corners, out1):
        any_out |= o
        lo_y = np.minimum(lo_y, np.min(np.where(o, iy, tex_h - 1), axis=1))
        lo_x = np.minimum(lo_x, np.min(np.where(o, ix, tex_w - 1), axis=1))
    has2 = any_out.any(axis=1).astype(np.int32)
    oy2 = np.clip((lo_y // ALIGN_H) * ALIGN_H, r0,
                  max(r1 - region_h, r0)).astype(np.int32)
    ox2 = np.clip((lo_x // ALIGN_W) * ALIGN_W, 0,
                  max(tex_w - region_w, 0)).astype(np.int32)
    oy2 = np.where(has2 > 0, oy2, 0).astype(np.int32)
    ox2 = np.where(has2 > 0, ox2, 0).astype(np.int32)

    # residuals: valid contributions outside both windows
    hh = -(-h // tile_h) * tile_h
    ww = -(-w // tile_w) * tile_w
    t_rows = np.arange(n_tiles) // (ww // tile_w)
    t_cols = np.arange(n_tiles) % (ww // tile_w)
    in_tile = np.arange(tile_px)
    py_img = t_rows[:, None] * tile_h + in_tile[None] // tile_w
    px_img = t_cols[:, None] * tile_w + in_tile[None] % tile_w
    pix_flat = py_img * w + px_img

    res_t, res_p, res_w = [], [], []
    for (iy, ix, wgt), o1 in zip(corners, out1):
        out = o1 & ~in_window(iy, ix, oy2, ox2)
        if out.any():
            sel = np.nonzero(out)
            res_t.append((iy[sel] * tex_w + ix[sel]).astype(np.int32))
            res_p.append(pix_flat[sel].astype(np.int32))
            res_w.append(wgt[sel].astype(np.float32))
    res_texel = np.concatenate(res_t) if res_t else np.zeros((0,), np.int32)
    res_pixel = np.concatenate(res_p) if res_p else np.zeros((0,), np.int32)
    res_weight = np.concatenate(res_w) if res_w else np.zeros((0,), np.float32)

    return dict(n_tiles=n_tiles, oy=oy, ox=ox, oy2=oy2, ox2=ox2, has2=has2,
                alive=alive, s_alive=s_alive, res_texel=res_texel,
                res_pixel=res_pixel, res_weight=res_weight)


def _order_and_runs(p, for_splat):
    """Sort tiles by window; compute load/store flags over window runs.

    Gather: all tiles (dead ones inert), seams handled via a second scratch
    so they don't break runs. Splat: live tiles only; seam tiles are
    singleton runs (their secondary pass reuses the window scratch, so the
    run must be closed around them).
    """
    n = p["n_tiles"]
    alive = p["s_alive"] if for_splat else p["alive"]
    has2 = p["has2"]
    oy, ox = p["oy"], p["ox"]
    if for_splat:
        ids = np.nonzero(alive)[0]
        order = ids[np.lexsort((ox[ids], oy[ids], has2[ids] > 0))]
    else:
        order = np.lexsort((ox, oy, ~alive))  # live tiles first, by window
    o_oy, o_ox = oy[order], ox[order]
    o_alive = alive[order].astype(np.int32)
    o_has2 = (has2[order] * o_alive).astype(np.int32)

    m = len(order)
    load = np.zeros(m, np.int32)
    store = np.zeros(m, np.int32)
    last = None
    last_idx = -1
    for i in range(m):
        if not o_alive[i]:
            continue
        singleton = for_splat and o_has2[i]
        if singleton or last is None or (o_oy[i], o_ox[i]) != last:
            load[i] = 1
            if for_splat and last_idx >= 0:
                store[last_idx] = 1
            last = None if singleton else (o_oy[i], o_ox[i])
        if singleton:
            store[i] = 1
            last_idx = -1
        else:
            last_idx = i
    if for_splat and last_idx >= 0:
        store[last_idx] = 1
    return dict(ids=order.astype(np.int32), oy=o_oy, ox=o_ox, load=load,
                store=store, alive=o_alive, oy2=p["oy2"][order],
                ox2=p["ox2"][order], has2=o_has2)


def plan_arrays_for_views(uv_views, tex_h, tex_w, cap=None, region_h=None,
                          region_w=None, tile_h=TILE_H, tile_w=TILE_W,
                          weight_masks=None) -> PlanArrays:
    """Batched plan for ``uv_views [V, H, W, 2]`` (numpy).

    Args:
        weight_masks: optional ``[V, H, W]`` bool — True where the pixel's
            gradient may be nonzero (see data/grad_masks.py). Tiles that are
            False everywhere are dropped from the splat schedule.
        region_h/w: override the automatic window sizing (tests).
    """
    uv_views = np.asarray(uv_views)
    nv = uv_views.shape[0]
    if region_h is None or region_w is None:
        rh, rw = choose_region(uv_views, tex_h, tex_w, tile_h, tile_w)
        region_h, region_w = (region_h or rh), (region_w or rw)
    region_h, region_w = effective_region(tex_h, tex_w, region_h, region_w)

    views = [_plan_view(uv_views[v], tex_h, tex_w, tile_h, tile_w,
                        region_h, region_w,
                        None if weight_masks is None else weight_masks[v])
             for v in range(nv)]
    gs = [_order_and_runs(p, for_splat=False) for p in views]
    ss = [_order_and_runs(p, for_splat=True) for p in views]

    # pad splat schedules to a common bucket (schedule arrays must be
    # rectangular; padding entries are inert: alive=0, no load/store)
    s_len = max(1, max(len(s["ids"]) for s in ss))
    s_len = _roundup(s_len, _SPLAT_BUCKET)

    def pad(a, n, fill=0):
        out = np.full((n,), fill, a.dtype if a.size else np.int32)
        out[:len(a)] = a
        return out

    def stack(key, seqs, n=None):
        return np.stack([pad(s[key], n or len(s[key])) for s in seqs])

    g = {k: np.stack([np.asarray(s[k], np.int32) for s in gs])
         for k in ("ids", "oy", "ox", "load", "alive", "oy2", "ox2", "has2")}
    s = {k: np.stack([pad(np.asarray(s_[k], np.int32), s_len) for s_ in ss])
         for k in ("ids", "oy", "ox", "load", "store", "alive", "oy2", "ox2",
                   "has2")}

    # residuals padded to a power-of-two cap (stable across similar batches)
    counts = [len(p["res_texel"]) for p in views]
    if cap is None:
        cap = max(1, max(counts))
        cap = int(2 ** np.ceil(np.log2(cap)))
    rt = np.zeros((nv, cap), np.int32)
    rp = np.zeros((nv, cap), np.int32)
    rw_ = np.zeros((nv, cap), np.float32)
    for i, p in enumerate(views):
        n = len(p["res_texel"])
        if n > cap:
            raise ValueError(f"residual cap {cap} < count {n}")
        rt[i, :n] = p["res_texel"]
        rp[i, :n] = p["res_pixel"]
        rw_[i, :n] = p["res_weight"]

    return PlanArrays(
        g_ids=g["ids"], g_oy=g["oy"], g_ox=g["ox"], g_load=g["load"],
        g_alive=g["alive"], g_oy2=g["oy2"], g_ox2=g["ox2"], g_has2=g["has2"],
        s_ids=s["ids"], s_oy=s["oy"], s_ox=s["ox"], s_load=s["load"],
        s_store=s["store"], s_alive=s["alive"], s_oy2=s["oy2"],
        s_ox2=s["ox2"], s_has2=s["has2"],
        res_texel=rt, res_pixel=rp, res_weight=rw_,
        tile_h=tile_h, tile_w=tile_w,
        region_h=int(region_h), region_w=int(region_w))


def plan_arrays_banded(uv_views, tex_h, tex_w, n_bands, cap=None,
                       tile_h=TILE_H, tile_w=TILE_W,
                       weight_masks=None) -> PlanArrays:
    """Atlas-sharded plan: the atlas is split into ``n_bands`` row bands
    (chip d owns rows [d*H/D, (d+1)*H/D)); every schedule/residual array
    gains a leading band axis so a shard_map over the atlas axis slices it.

    Windows never cross a band (they are clamped into the owner band and the
    overflow rides the secondary-window / residual machinery), so no halo
    exchange is needed in the hot path: each chip gathers/splats only its
    band, partial per-pixel gathers are psum'd, and residual contributions
    are routed to the band that owns their texel. Origins and residual texel
    indices are band-LOCAL (the chip's atlas slice is its own array).
    """
    uv_views = np.asarray(uv_views)
    nv = uv_views.shape[0]
    assert tex_h % n_bands == 0 and (tex_h // n_bands) % ALIGN_H == 0, \
        (tex_h, n_bands)
    band_h = tex_h // n_bands
    region_h, region_w = choose_region(uv_views, tex_h, tex_w, tile_h,
                                       tile_w, max_region_h=band_h)

    # tile ownership: the band holding the footprint's median row
    owners = []
    import warnings

    for v in range(nv):
        uvt = tile_uv(np.asarray(uv_views[v], np.float32), tile_h, tile_w)
        iy0, _, _, _, _, _ = _corner_data(uvt, tex_h, tex_w)
        valid = ((uvt[..., 0] > -5.0)
                 & ~((uvt[..., 0] == -1.0) & (uvt[..., 1] == -1.0)))
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            med = np.nanmedian(
                np.where(valid, iy0.astype(np.float64), np.nan), axis=1)
        med = np.nan_to_num(med, nan=0.0)
        owners.append(np.clip(med.astype(np.int64) // band_h, 0,
                              n_bands - 1))

    per_band = []  # [band][view] -> (plan dict, gather order, splat order)
    for b in range(n_bands):
        r0, r1 = b * band_h, (b + 1) * band_h
        rows = []
        for v in range(nv):
            p = _plan_view(uv_views[v], tex_h, tex_w, tile_h, tile_w,
                           region_h, region_w,
                           None if weight_masks is None else weight_masks[v],
                           row_range=(r0, r1), owner_mask=owners[v] == b)
            rows.append((p, _order_and_runs(p, for_splat=False),
                         _order_and_runs(p, for_splat=True)))
        per_band.append(rows)

    # re-bucket residuals by the band OWNING the texel (scatter locality),
    # independent of which band's windows produced them
    res = [[([], [], []) for _ in range(nv)] for _ in range(n_bands)]
    for b in range(n_bands):
        for v in range(nv):
            p = per_band[b][v][0]
            if not len(p["res_texel"]):
                continue
            tband = (p["res_texel"] // tex_w) // band_h
            for tb in np.unique(tband):
                sel = tband == tb
                res[tb][v][0].append(p["res_texel"][sel]
                                     - tb * band_h * tex_w)  # band-local
                res[tb][v][1].append(p["res_pixel"][sel])
                res[tb][v][2].append(p["res_weight"][sel])
    counts = [len(np.concatenate(res[b][v][0])) if res[b][v][0] else 0
              for b in range(n_bands) for v in range(nv)]
    if cap is None:
        cap = max(1, max(counts))
        cap = int(2 ** np.ceil(np.log2(cap)))
    assert max(counts) <= cap, (max(counts), cap)

    s_len = max(1, max(len(per_band[b][v][2]["ids"])
                       for b in range(n_bands) for v in range(nv)))
    s_len = _roundup(s_len, _SPLAT_BUCKET)

    def pad(a, n):
        out = np.zeros((n,), np.int32)
        out[:len(a)] = a
        return out

    def assemble_band(b, r0):
        gs = [per_band[b][v][1] for v in range(nv)]
        ss = [per_band[b][v][2] for v in range(nv)]
        g = {k: np.stack([np.asarray(s[k], np.int32) for s in gs])
             for k in ("ids", "oy", "ox", "load", "alive", "oy2", "ox2",
                       "has2")}
        s = {k: np.stack([pad(np.asarray(s_[k], np.int32), s_len)
                          for s_ in ss])
             for k in ("ids", "oy", "ox", "load", "store", "alive", "oy2",
                       "ox2", "has2")}
        # window rows stay GLOBAL (the uv->texel math needs them); the
        # kernels subtract the chip's band offset for the DMA. Dead entries
        # get in-band benign origins so the subtraction stays aligned >= 0.
        for d in (g, s):
            d["oy"] = np.where(d["alive"] > 0, d["oy"], r0).astype(np.int32)
            d["oy2"] = np.maximum(d["oy2"], r0).astype(np.int32)
        rt = np.zeros((nv, cap), np.int32)
        rp = np.zeros((nv, cap), np.int32)
        rw_ = np.zeros((nv, cap), np.float32)
        for v in range(nv):
            if res[b][v][0]:
                t = np.concatenate(res[b][v][0])
                rt[v, :len(t)] = t
                rp[v, :len(t)] = np.concatenate(res[b][v][1])
                rw_[v, :len(t)] = np.concatenate(res[b][v][2])
        return g, s, rt, rp, rw_

    bands = [assemble_band(b, b * band_h) for b in range(n_bands)]
    gk = ("ids", "oy", "ox", "load", "alive", "oy2", "ox2", "has2")
    sk = ("ids", "oy", "ox", "load", "store", "alive", "oy2", "ox2", "has2")
    g = {k: np.stack([bb[0][k] for bb in bands]) for k in gk}
    s = {k: np.stack([bb[1][k] for bb in bands]) for k in sk}
    return PlanArrays(
        g_ids=g["ids"], g_oy=g["oy"], g_ox=g["ox"], g_load=g["load"],
        g_alive=g["alive"], g_oy2=g["oy2"], g_ox2=g["ox2"], g_has2=g["has2"],
        s_ids=s["ids"], s_oy=s["oy"], s_ox=s["ox"], s_load=s["load"],
        s_store=s["store"], s_alive=s["alive"], s_oy2=s["oy2"],
        s_ox2=s["ox2"], s_has2=s["has2"],
        res_texel=np.stack([bb[2] for bb in bands]),
        res_pixel=np.stack([bb[3] for bb in bands]),
        res_weight=np.stack([bb[4] for bb in bands]),
        tile_h=tile_h, tile_w=tile_w,
        region_h=int(region_h), region_w=int(region_w),
        tex_h_global=int(tex_h))
