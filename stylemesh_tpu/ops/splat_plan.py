"""Host-side planning for the Pallas texture gather/splat kernels (v3).

The backward of bilinear texture sampling is a scatter-add of 4-corner
weighted pixel gradients into the atlas; XLA's TPU scatter costs ~90ns/index
(measured: 580ms for one 2x784x1045 level into 4096² — it dominated the
training step). Because UV maps are *constants per scene*, a fast path is
planned offline per (view, pyramid level, texture layer):

- pixels are processed in fixed tiles (``tile_h x tile_w``);
- UV smoothness means a pixel tile's 4-corner footprint usually fits a small
  texel window; the planner sizes the window **per (level, layer)** from the
  actual footprint distribution (a cost model trades window area — the MXU
  matmul cost is proportional to it — against seam-tile splitting);
- tiles are *sorted by window origin* and consecutive schedule entries
  sharing a window are grouped: the kernel loads/stores the window once per
  group;
- tiles whose footprint exceeds the window (UV chart seams) are **split into
  per-island entries**: the tile's pixels are partitioned host-side into
  groups whose footprints each fit one window (bucket by half-window texel
  cell — so no single bucket can exceed a window — then best-fit bbox
  merge), each group becomes its own schedule entry carrying a pixel
  label the kernel filters on. Pixel sets are disjoint, so every 4-corner
  contribution is processed exactly once, with the same factorized-matmul
  path as smooth tiles — no per-corner slow path;
- the rare leftovers (> MAX_TILE_ENTRIES islands in one tile, corners
  clipped at an atlas band edge) go to a compact XLA residual scatter;
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

# bump when planner output semantics, the cost model, or PlanArrays layout
# change — invalidates the on-disk plan cache (data/loading.py)
PLANNER_VERSION = 5

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
# schedules are padded to multiples of these (fewer recompiles across
# batches with different live-tile counts)
_SPLAT_BUCKET = 64
_GATHER_BUCKET = 16
# a tile's pixels are split into at most this many per-island entries;
# overflow pixels go to the residual scatter (label -1). Generous on
# purpose: an extra small-window entry costs ~1-5 us while a residual
# corner burst costs its padded XLA-scatter cap — the window-sizing
# simulation prices the entries, so unneeded headroom is free.
MAX_TILE_ENTRIES = 16


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "labels", "g_ids", "g_oy", "g_ox", "g_sub", "g_load", "g_acc",
        "g_alive", "s_ids", "s_oy", "s_ox", "s_sub", "s_load", "s_store",
        "s_alive", "res_texel", "res_pixel", "res_weight",
    ],
    meta_fields=["tile_h", "tile_w", "region_h", "region_w", "tex_h_global"],
)
@dataclasses.dataclass(frozen=True)
class PlanArrays:
    """Device-side plan for one (level, texture-layer) pair, batched over
    views. All schedule arrays are ``[V, n]`` with per-view-LOCAL tile ids so
    the view axis shards cleanly; wrappers flatten and add view offsets.
    Atlas-banded plans get a leading band axis on every schedule/residual
    array (and a tiled copy of ``labels`` per band) so a shard_map over the
    atlas axis slices them.

    ``labels [V, H, W]``: per-pixel entry label within its tile (int8;
    0 for ordinary pixels, 0..k-1 for split seam tiles, -1 for pixels routed
    to the residual scatter). The wrappers feed it to the kernels as a third
    uv channel; an entry processes only the pixels whose label equals its
    ``sub`` id — pixel sets are disjoint so nothing double-counts.

    Gather schedule (>= 1 entry per tile, entries of one tile consecutive):
      g_ids[v, i]   tile id processed at grid step i of view v
      g_oy/g_ox     window origin (global atlas rows; kernels subtract the
                    chip's band offset for the DMA)
      g_sub         entry label this step processes
      g_load        1 = DMA the window (start of a window run)
      g_acc         1 = accumulate into the tile's out block (a previous
                    entry of the same tile already wrote it)
      g_alive       0 = inert (dead/padding): write zeros when g_acc == 0,
                    do nothing when g_acc == 1

    Splat schedule (live entries only, padded to a bucket): s_ids / s_oy /
    s_ox / s_sub as above, s_load / s_store window-run boundaries, s_alive
    0 = padding.

    Residual scatter (contributions no entry window covers): res_texel /
    res_pixel / res_weight ``[V, cap]``.

    Static meta: tile_h/tile_w (pixel tiling) and region_h/region_w (window).
    """

    labels: np.ndarray
    g_ids: np.ndarray
    g_oy: np.ndarray
    g_ox: np.ndarray
    g_sub: np.ndarray
    g_load: np.ndarray
    g_acc: np.ndarray
    g_alive: np.ndarray
    s_ids: np.ndarray
    s_oy: np.ndarray
    s_ox: np.ndarray
    s_sub: np.ndarray
    s_load: np.ndarray
    s_store: np.ndarray
    s_alive: np.ndarray
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


def _untile_labels(labels_tiled, h, w, tile_h, tile_w):
    """[n_tiles, tile_px] -> [h, w] (inverse of the tile_uv layout)."""
    hh = -(-h // tile_h) * tile_h
    ww = -(-w // tile_w) * tile_w
    x = labels_tiled.reshape(hh // tile_h, ww // tile_w, tile_h, tile_w)
    x = x.transpose(0, 2, 1, 3).reshape(hh, ww)
    return x[:h, :w]


def _roundup(x, m):
    return int(-(-int(x) // m) * m)


def _coarse_grid(region):
    """Half-region coarse anchor grid (8-sublane floor). Fitting tiles and
    per-island seam groups MUST share this grid — identical window origins
    are what lets the schedule sort coalesce their DMA runs."""
    return max(8, (region // 2 // 8) * 8)


def clamp_window_hw(need_h, need_w, tex_h, tex_w, max_region_h=None):
    """Legal EFFECTIVE window sizes for a (tex_h, tex_w) layer — the single
    source of the planner's window-size constraints (choose_region and the
    calibration sweeps in tools/ must price the same candidate set).

    v4 kernels roll the DMA'd window to the true origin, so no (8, 128)
    alignment slack is baked in; both axes only round to the 8-sublane grid
    of the one-hot arrays, and the window shrinks to the VMEM budget."""
    rh = min(_roundup(max(need_h, 8), 8), tex_h, max_region_h or tex_h)
    rw = min(_roundup(max(need_w, 16), 8), tex_w)
    # VMEM cap: shrink the larger axis until the window fits the budget
    while rh * rw > _MAX_REGION_TEXELS:
        if rw >= 16 and rw >= rh:
            rw -= 8
        elif rh > 8:
            rh -= 8
        else:
            break
    return rh, rw


def choose_region(uv_views, tex_h, tex_w, tile_h=TILE_H, tile_w=TILE_W,
                  max_region_h=None):
    """Size the texel window for this (level, layer) from the footprint
    distribution over all views' tiles.

    Cost model per tile: the kernel's MXU/VPU work is proportional to the
    window area; a tile whose footprint misses the window is split into ~2
    entries (each a full window pass). Alignment slack: origins are floored
    to (8, 128), so the window must cover bbox + align + 2.
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
        return clamp_window_hw(need_h, need_w, tex_h, tex_w, max_region_h)

    # Per-entry kernel cost model, calibrated against a measured region
    # sweep on v5e (tools/gather_sweep.py; ~5.3 ns per unit): a fixed
    # per-entry cost (corner math, dispatch), the one-hot builds ~
    # (rh + rw) x tile_px VPU ops, and the factorized matmuls ~ rh*rw-ish
    # MXU work. Window runs pay a load(+store) DMA that serializes when
    # consecutive windows overlap (~570 units), and every corner that no
    # window covers falls to the ~90ns/element XLA residual scatter
    # (~120 units once the pow2 cap padding, the gather-side
    # residual overlay, and both backward passes are counted) — on seam-heavy scenes tiny windows explode residuals, so
    # the top model candidates are SIMULATED on one view (_plan_view) and
    # priced with their actual entry/run/residual counts.
    _C_FIXED = 200.0
    _C_RES = 120.0

    def run_cost(rh, rw):
        # a window run's DMA cost scales with the DMA superset bytes (the
        # old flat 570 was calibrated at a ~250x180 window and overpriced
        # small-window runs ~2x): ~1 us issue/latency floor plus the HBM
        # transfer, in the model's ~5.3 ns units. Matches the measured 570
        # at (240, 176).
        eh = min(rh + 8, tex_h)
        ew = min(-(-rw // 128) * 128 + 128, tex_w)
        return 190.0 + (12.0 * eh * ew) / 3000.0

    def model_cost(rh, rw, n_entries):
        # the kernels' dots quantize to MXU tiles: the splat runs
        # [3*rh, tile_px] @ [rw, tile_px]^T (~tile_px cycles per
        # (128 x 128) output tile) and the gather [3*rh, rw] @ [rw, 1024]
        # (~rw cycles per tile row) — measured 13.6 us/entry at (264,168)
        # vs 8.7 at (144,256) on the demo room, which a smooth rh*rw term
        # cannot rank correctly
        tm = -(-3 * rh // 128)
        tn = -(-rw // 128)
        splat_mm = 205.0 * tm * tn
        gather_mm = 1.6 * rw * tm
        return n_entries * (_C_FIXED + rh + rw + splat_mm + gather_mm)

    cand = {}
    quants = (1.0, 0.99, 0.95, 0.85)
    for qh in quants:
        for qw in quants:
            need_h = int(np.quantile(fh, qh)) + 2
            need_w = int(np.quantile(fw, qw)) + 2
            rh, rw = clamp_hw(need_h, need_w)
            fits = (fh <= rh - 2) & (fw <= rw - 2)
            # a split tile costs ~2 window passes instead of 1
            cost = model_cost(rh, rw, fits.size + int((~fits).sum()))
            cand.setdefault((rh, rw), cost)
            if qh == 1.0 and qw == 1.0:
                # the all-fits candidate must stay simulatable: on seam-heavy
                # scenes it is the escape hatch from residual explosions even
                # when the per-entry model ranks it last
                cand[(rh, rw)] = min(cand[(rh, rw)], -1.0)
    # seam-heavy scenes have BIMODAL footprints (smooth tiles vs island
    # jumps): the quantile grid then skips the sweet spot between "tiny"
    # and "huge", so also ladder the q85 base by fixed scale factors and
    # let the simulation pick (forced into the shortlist at rank 0)
    base_h = int(np.quantile(fh, 0.85)) + 2
    base_w = int(np.quantile(fw, 0.85)) + 2
    for f in (2, 3, 5):
        rh, rw = clamp_hw(base_h * f, base_w * f)
        cand[(rh, rw)] = min(cand.get((rh, rw), np.inf), -1.0)
    # ...and ladder DOWN from the median: when >15% of tiles span islands
    # (demo room L0/L1: q85 ~ 420x860 vs median ~ 146x125) every grid
    # candidate is huge, yet a median-sized window + per-island entry
    # splitting is ~6x cheaper (the simulation prices the splits and
    # residuals, so small candidates are safe to offer)
    for qb in (0.5, 0.25):
        bh = int(np.quantile(fh, qb)) + 2
        bw = int(np.quantile(fw, qb)) + 2
        for f in (1, 2):
            rh, rw = clamp_hw(bh * f, bw * f)
            cand[(rh, rw)] = min(cand.get((rh, rw), np.inf), -1.0)
    shortlist = sorted(cand, key=cand.get)[:11]

    # Simulate the shortlist on a SPREAD of views (residual counts are
    # heavily view-dependent: on the demo room view 0 can plan residual-free
    # at a window whose global residual count is 100k+ — pricing one view
    # picked pathological windows, the round-3 regression). Residuals are
    # priced at their padded cost: every view's row is padded to the pow2
    # cap of the worst view, which is what the XLA scatter actually runs.
    # Two-stage to keep planning cheap on this 1-core host: every candidate
    # is simulated on view 0, only the top-4 survivors also pay the other
    # spread views (a bad window is bad on view 0 too; the multi-view pass
    # exists to veto windows that only LOOK good on view 0).
    nv = uv_views.shape[0]
    sim_views = sorted({0, nv // 2, nv - 1})
    pre_cache = {}

    sim_memo = {}  # (rh, rw, view) -> (n_entries, runs, res_count)

    def sim_one(rh, rw, v):
        key = (rh, rw, v)
        if key in sim_memo:
            return sim_memo[key]
        if v not in pre_cache:
            pre_cache[v] = _view_pre(np.asarray(uv_views[v], np.float32),
                                     tex_h, tex_w, tile_h, tile_w)
        sim = _plan_view(None, tex_h,
                         tex_w, tile_h, tile_w, rh, rw,
                         weight_mask=None, n_bands=1, pre=pre_cache[v])
        runs = 0
        if len(sim["e_tile"]):
            order = np.lexsort((sim["e_ox"], sim["e_oy"]))
            oy_s = sim["e_oy"][order]
            ox_s = sim["e_ox"][order]
            runs = 1 + int(np.sum((oy_s[1:] != oy_s[:-1])
                                  | (ox_s[1:] != ox_s[:-1])))
        out = (len(sim["e_tile"]), runs, len(sim["res_texel"]))
        sim_memo[key] = out
        return out

    def simulate(rh, rw, views):
        per = [sim_one(rh, rw, v) for v in views]
        n_entries = sum(p[0] for p in per)
        runs = sum(p[1] for p in per)
        cap = 0
        if max(p[2] for p in per):
            cap = int(2 ** np.ceil(np.log2(max(p[2] for p in per))))
        return (nv / len(views)) * (model_cost(rh, rw, n_entries)
                                    + runs * run_cost(rh, rw)
                                    + len(views) * cap * _C_RES)

    stage1 = sorted(shortlist, key=lambda c: simulate(c[0], c[1], [0]))
    best = None
    for rh, rw in stage1[:4]:
        cost = simulate(rh, rw, sim_views)
        if best is None or cost < best[0]:
            best = (cost, rh, rw)
    return best[1], best[2]


def _tile_partition(iy0_t, ix0_t, valid_t, region_h, region_w):
    """Partition ONE seam tile's valid pixels into at most MAX_TILE_ENTRIES
    groups whose iy0/ix0 bounding boxes each fit an aligned window.

    Pixels are bucketed by texel cell (half-window grid), buckets greedily
    merged largest-first while the union bbox still fits. Returns
    ``labels [tile_px]`` (-1 = overflow, routed to residuals) and the group
    bbox list ``[(y0, y1, x0, x1), ...]``.
    """
    def bbox_fits(y0, y1, x0, x1):
        # exact test against the true origin the entry will get (v4)
        return y1 - y0 <= region_h - 2 and x1 - x0 <= region_w - 2

    # cells at most HALF the usable window: any single cell always fits a
    # window (so nothing overflows to residuals by bucketing alone — the old
    # (8, 128) alignment floors could make one bucket wider than a small
    # window, which is what exploded residuals at small candidate windows on
    # seam scenes), and 2x2 adjacent cells can still merge into one window
    bh = max(4, (region_h - 2) // 2)
    bw = max(4, (region_w - 2) // 2)
    labels = np.full(iy0_t.shape, -1, np.int32)
    vy = iy0_t[valid_t]
    vx = ix0_t[valid_t]
    if vy.size == 0:
        return labels, []
    cell = (vy.astype(np.int64) // bh) * 1_000_000 + vx // bw
    uniq, inv, counts = np.unique(cell, return_inverse=True,
                                  return_counts=True)
    # per-bucket bboxes in one vectorized pass (this loop runs for every
    # seam tile of every view and sim candidate — boolean-mask reductions
    # per bucket were the planner's hottest line)
    nb = len(uniq)
    order_px = np.argsort(inv, kind="stable")
    starts = np.zeros(nb, np.int64)
    starts[1:] = np.cumsum(counts[:-1])
    sy = vy[order_px]
    sx = vx[order_px]
    by0 = np.minimum.reduceat(sy, starts)
    by1 = np.maximum.reduceat(sy, starts)
    bx0 = np.minimum.reduceat(sx, starts)
    bx1 = np.maximum.reduceat(sx, starts)
    groups = []
    bucket_group = np.full(nb, -1, np.int32)
    for bi in np.argsort(-counts, kind="stable"):
        y0, y1 = int(by0[bi]), int(by1[bi])
        x0, x1 = int(bx0[bi]), int(bx1[bi])
        # best-fit: merge into the group whose union bbox grows least
        # (first-fit stranded tight groups behind a sprawling group 0)
        best = None
        for gi, g in enumerate(groups):
            ny0, ny1 = min(g[0], y0), max(g[1], y1)
            nx0, nx1 = min(g[2], x0), max(g[3], x1)
            if bbox_fits(ny0, ny1, nx0, nx1):
                grow = ((ny1 - ny0) * (nx1 - nx0)
                        - (g[1] - g[0]) * (g[3] - g[2]))
                if best is None or grow < best[0]:
                    best = (grow, gi, (ny0, ny1, nx0, nx1))
        if best is not None:
            groups[best[1]] = best[2]
            bucket_group[bi] = best[1]
        elif len(groups) < MAX_TILE_ENTRIES and bbox_fits(y0, y1, x0, x1):
            groups.append((y0, y1, x0, x1))
            bucket_group[bi] = len(groups) - 1
    labels[valid_t] = bucket_group[inv]
    return labels, groups


def _view_pre(uv, tex_h, tex_w, tile_h, tile_w):
    """Candidate-independent per-view precompute for :func:`_plan_view`
    (tiled uv, 4-corner data, validity masks) — hoisted so window-sizing
    simulation (choose_region) pays it once per view, not per candidate."""
    h, w = uv.shape[:2]
    uv_tiles = tile_uv(np.asarray(uv, np.float32), tile_h, tile_w)
    iy0, iy1, ix0, ix1, wy1, wx1 = _corner_data(uv_tiles, tex_h, tex_w)
    # padded pixels excluded entirely; background pixels (baked uv exactly 0
    # -> grid exactly (-1,-1) -> texel (0,0) with weight 1) are handled
    # analytically by the wrappers, so they must not pollute entry bboxes
    # nor the residual lists
    valid = uv_tiles[..., 0] > -5.0
    background = (uv_tiles[..., 0] == -1.0) & (uv_tiles[..., 1] == -1.0)
    valid = valid & ~background
    return dict(h=h, w=w, corners=(iy0, iy1, ix0, ix1, wy1, wx1),
                valid=valid, alive=valid.any(axis=1))


def _plan_view(uv, tex_h, tex_w, tile_h, tile_w, region_h, region_w,
               weight_mask=None, n_bands=1, pre=None):
    """Plan one view: per-tile entries (split at island seams), per-pixel
    labels, and residual leftovers. Entry windows are confined to the atlas
    row band owning the entry's footprint when ``n_bands > 1``."""
    band_h = tex_h // n_bands
    if pre is None:
        pre = _view_pre(uv, tex_h, tex_w, tile_h, tile_w)
    h, w = pre["h"], pre["w"]
    tile_px = tile_h * tile_w
    iy0, iy1, ix0, ix1, wy1, wx1 = pre["corners"]
    n_tiles = iy0.shape[0]
    valid, alive = pre["valid"], pre["alive"]

    # splat-liveness per pixel: gradient provably zero -> excluded from the
    # splat schedule (entries all of whose pixels are dead are dropped)
    if weight_mask is not None:
        wm = _pad_to_tiles(np.asarray(weight_mask, bool).reshape(h, w, 1),
                           tile_h, tile_w, False)
        hh, ww = wm.shape[:2]
        wm = wm.reshape(hh // tile_h, tile_h, ww // tile_w, tile_w)
        wm = wm.transpose(0, 2, 1, 3).reshape(-1, tile_px)
        wm = wm & valid
    else:
        wm = valid

    big = np.iinfo(np.int32).max
    lo_y = np.min(np.where(valid, iy0, big), axis=1)
    hi_y = np.max(np.where(valid, iy0, -1), axis=1)
    lo_x = np.min(np.where(valid, ix0, big), axis=1)
    hi_x = np.max(np.where(valid, ix0, -1), axis=1)

    # window origin for fitting tiles, in preference order:
    # 1. coarse anchor — footprint min snapped DOWN to a half-region grid, if
    #    the footprint still fits: nearby tiles then share identical windows
    #    and the kernel loads/stores each shared window once per run;
    # 2. fine anchor — the footprint min itself (v4: origins are TRUE texel
    #    coords; the kernels align the DMA down to the (8, 128) grid and
    #    roll the loaded window back, so no alignment slack is planned in).
    # The fit test is exact against the chosen origin: the window must cover
    # the i1 corners too (max i0 + 1 < origin + region).
    def fit_axis(lo, hi, region):
        coarse = _coarse_grid(region)
        o_coarse = (np.maximum(lo, 0) // coarse) * coarse
        fits_coarse = (hi - o_coarse) <= (region - 2)
        o_fine = np.maximum(lo, 0)
        fits_fine = (hi - o_fine) <= (region - 2)
        return (np.where(fits_coarse, o_coarse, o_fine).astype(np.int64),
                fits_coarse | fits_fine)

    oy_fit, fy = fit_axis(lo_y, hi_y, region_h)
    ox_fit, fx = fit_axis(lo_x, hi_x, region_w)
    fits = alive & fy & fx

    # per-pixel entry labels (0 for fitting tiles) + per-tile entry lists;
    # fitting tiles (the vast majority) are planned fully vectorized, only
    # seam tiles run the per-tile partition loop
    labels = np.where(valid, 0, -1).astype(np.int32)
    win_oy = np.full((n_tiles, tile_px), -(10 ** 6), np.int64)
    win_ox = np.full((n_tiles, tile_px), -(10 ** 6), np.int64)

    fit_ids = np.nonzero(fits)[0]
    fb = np.clip((lo_y[fit_ids] + hi_y[fit_ids]) // 2 // band_h,
                 0, n_bands - 1).astype(np.int64)
    r0v = fb * band_h
    f_oy = np.clip(oy_fit[fit_ids], r0v,
                   np.maximum(r0v + band_h - region_h, r0v)).astype(np.int32)
    f_ox = np.clip(ox_fit[fit_ids], 0,
                   max(tex_w - region_w, 0)).astype(np.int32)
    win_oy[fit_ids] = np.where(valid[fit_ids], f_oy[:, None], -(10 ** 6))
    win_ox[fit_ids] = np.where(valid[fit_ids], f_ox[:, None], -(10 ** 6))

    e_tile = [fit_ids.astype(np.int32)]
    e_sub = [np.zeros(len(fit_ids), np.int32)]
    e_oy = [f_oy]
    e_ox = [f_ox]
    e_band = [fb.astype(np.int32)]
    e_salive = [wm[fit_ids].any(axis=1)]

    # per-island group origins prefer the same half-region coarse grid as
    # fitting tiles (fit_axis): groups from neighboring seam tiles then share
    # identical windows and the schedule sort coalesces their loads
    coarse_y = _coarse_grid(region_h)
    coarse_x = _coarse_grid(region_w)
    for t in np.nonzero(alive & ~fits)[0]:
        labs, groups = _tile_partition(iy0[t], ix0[t], valid[t],
                                       region_h, region_w)
        labels[t] = np.where(valid[t], labs, -1)
        for gi, (y0, y1, x0, x1) in enumerate(groups):
            y0s = (max(y0, 0) // coarse_y) * coarse_y
            if y1 - y0s <= region_h - 2:
                y0 = y0s
            x0s = (max(x0, 0) // coarse_x) * coarse_x
            if x1 - x0s <= region_w - 2:
                x0 = x0s
            b = int(np.clip((y0 + y1) // 2 // band_h, 0, n_bands - 1))
            r0 = b * band_h
            oy_c = int(np.clip(y0, r0, max(r0 + band_h - region_h, r0)))
            ox_c = int(np.clip(x0, 0, max(tex_w - region_w, 0)))
            sel = labs == gi
            win_oy[t][sel] = oy_c
            win_ox[t][sel] = ox_c
            e_tile.append(np.asarray([t], np.int32))
            e_sub.append(np.asarray([gi], np.int32))
            e_oy.append(np.asarray([oy_c], np.int32))
            e_ox.append(np.asarray([ox_c], np.int32))
            e_band.append(np.asarray([b], np.int32))
            e_salive.append(np.asarray([bool(np.any(wm[t] & sel))]))

    e_tile = np.concatenate(e_tile).astype(np.int32)
    e_sub = np.concatenate(e_sub).astype(np.int32)
    e_oy = np.concatenate(e_oy).astype(np.int32)
    e_ox = np.concatenate(e_ox).astype(np.int32)
    e_band = np.concatenate(e_band).astype(np.int32)
    e_salive = np.concatenate(e_salive).astype(bool)

    corners = [
        (iy0, ix0, (1 - wy1) * (1 - wx1)),
        (iy0, ix1, (1 - wy1) * wx1),
        (iy1, ix0, wy1 * (1 - wx1)),
        (iy1, ix1, wy1 * wx1),
    ]
    hh = -(-h // tile_h) * tile_h
    ww = -(-w // tile_w) * tile_w
    t_rows = np.arange(n_tiles) // (ww // tile_w)
    t_cols = np.arange(n_tiles) % (ww // tile_w)
    in_tile = np.arange(tile_px)
    py_img = t_rows[:, None] * tile_h + in_tile[None] // tile_w
    px_img = t_cols[:, None] * tile_w + in_tile[None] % tile_w
    pix_flat = py_img * w + px_img

    res_t, res_p, res_w = [], [], []
    for iy, ix, wgt in corners:
        out = valid & ~((iy >= win_oy) & (iy < win_oy + region_h)
                        & (ix >= win_ox) & (ix < win_ox + region_w))
        if out.any():
            sel = np.nonzero(out)
            res_t.append((iy[sel].astype(np.int64) * tex_w
                          + ix[sel]).astype(np.int32))
            res_p.append(pix_flat[sel].astype(np.int32))
            res_w.append(wgt[sel].astype(np.float32))
    res_texel = np.concatenate(res_t) if res_t else np.zeros((0,), np.int32)
    res_pixel = np.concatenate(res_p) if res_p else np.zeros((0,), np.int32)
    res_weight = np.concatenate(res_w) if res_w else np.zeros((0,), np.float32)

    return dict(
        n_tiles=n_tiles, alive=alive,
        labels_img=_untile_labels(labels, h, w, tile_h, tile_w
                                  ).astype(np.int8),
        e_tile=e_tile, e_sub=e_sub, e_oy=e_oy, e_ox=e_ox, e_band=e_band,
        e_salive=e_salive,
        res_texel=res_texel, res_pixel=res_pixel, res_weight=res_weight)


def _gather_entries(p, band, r0):
    """Build one (view, band) gather schedule: every tile appears (inert when
    this band owns none of its entries), entries of one tile consecutive,
    tiles sorted by their first entry's window so runs can share loads."""
    n = p["n_tiles"]
    own = p["e_band"] == band
    e_tile, e_sub = p["e_tile"][own], p["e_sub"][own]
    e_oy, e_ox = p["e_oy"][own], p["e_ox"][own]
    # entries of one tile sorted by window, tiles keyed by first entry
    order = np.lexsort((e_sub, e_ox, e_oy))
    e_tile, e_sub = e_tile[order], e_sub[order]
    e_oy, e_ox = e_oy[order], e_ox[order]
    first = {}
    by_tile = {}
    for k in range(len(e_tile)):
        t = int(e_tile[k])
        by_tile.setdefault(t, []).append(k)
        if t not in first:
            first[t] = (int(e_oy[k]), int(e_ox[k]))
    live = sorted(by_tile.keys(), key=lambda t: first[t])
    inert = [t for t in range(n) if t not in by_tile]

    ids, oy, ox, sub, load, acc, alive = [], [], [], [], [], [], []
    prev_win = None
    for t in live:
        for j, k in enumerate(by_tile[t]):
            win = (int(e_oy[k]), int(e_ox[k]))
            ids.append(t)
            oy.append(win[0])
            ox.append(int(e_ox[k]))
            sub.append(int(e_sub[k]))
            load.append(1 if win != prev_win else 0)
            acc.append(1 if j > 0 else 0)
            alive.append(1)
            prev_win = win
    for t in inert:
        ids.append(t)
        oy.append(r0)
        ox.append(0)
        sub.append(0)
        load.append(0)
        acc.append(0)
        alive.append(0)
        prev_win = None
    return dict(ids=ids, oy=oy, ox=ox, sub=sub, load=load, acc=acc,
                alive=alive)


def _splat_entries(p, band, r0):
    """Build one (view, band) splat schedule: this band's gradient-live
    entries sorted by window; load at run starts, store at run ends."""
    own = (p["e_band"] == band) & p["e_salive"]
    e_tile, e_sub = p["e_tile"][own], p["e_sub"][own]
    e_oy, e_ox = p["e_oy"][own], p["e_ox"][own]
    order = np.lexsort((e_sub, e_tile, e_ox, e_oy))
    m = len(order)
    ids = e_tile[order].astype(np.int32)
    sub = e_sub[order].astype(np.int32)
    oy = e_oy[order].astype(np.int32)
    ox = e_ox[order].astype(np.int32)
    load = np.zeros(m, np.int32)
    store = np.zeros(m, np.int32)
    for i in range(m):
        if i == 0 or (oy[i], ox[i]) != (oy[i - 1], ox[i - 1]):
            load[i] = 1
            if i > 0:
                store[i - 1] = 1
    if m:
        store[m - 1] = 1
    return dict(ids=ids, oy=oy, ox=ox, sub=sub, load=load, store=store,
                alive=np.ones(m, np.int32))


def _pad_entry_dict(d, n, benign_oy, pad_acc):
    """Pad a schedule dict to length n with inert entries. Gather padding
    repeats the last tile id with acc=1 (kernel: no write, out block
    unchanged); splat padding is alive=0 (kernel skips entirely)."""
    m = len(d["ids"])
    out = {}
    last_id = int(d["ids"][m - 1]) if m else 0
    for k, v in d.items():
        a = np.zeros((n,), np.int32)
        a[:m] = np.asarray(v, np.int32)
        if k == "ids":
            a[m:] = last_id
        elif k == "oy":
            a[m:] = benign_oy
        elif k == "acc" and pad_acc:
            a[m:] = 1
        out[k] = a
    return out


def _assemble_plan(uv_views, tex_h, tex_w, n_bands, cap, region_h, region_w,
                   tile_h, tile_w, weight_masks) -> PlanArrays:
    uv_views = np.asarray(uv_views)
    nv = uv_views.shape[0]
    band_h = tex_h // n_bands
    views = [_plan_view(uv_views[v], tex_h, tex_w, tile_h, tile_w,
                        region_h, region_w,
                        None if weight_masks is None else weight_masks[v],
                        n_bands=n_bands)
             for v in range(nv)]

    gk = ("ids", "oy", "ox", "sub", "load", "acc", "alive")
    sk = ("ids", "oy", "ox", "sub", "load", "store", "alive")
    gs = [[_gather_entries(views[v], b, b * band_h) for v in range(nv)]
          for b in range(n_bands)]
    ss = [[_splat_entries(views[v], b, b * band_h) for v in range(nv)]
          for b in range(n_bands)]
    g_len = _roundup(max(len(g["ids"]) for row in gs for g in row),
                     _GATHER_BUCKET)
    s_len = _roundup(max(1, max(len(s["ids"]) for row in ss for s in row)),
                     _SPLAT_BUCKET)
    for b in range(n_bands):
        r0 = b * band_h
        gs[b] = [_pad_entry_dict(g, g_len, r0, pad_acc=True) for g in gs[b]]
        ss[b] = [_pad_entry_dict(s, s_len, r0, pad_acc=False) for s in ss[b]]

    # residuals re-bucketed by the band OWNING the texel (scatter locality);
    # texel indices become band-local in banded mode
    res = [[([], [], []) for _ in range(nv)] for _ in range(n_bands)]
    for v, p in enumerate(views):
        if not len(p["res_texel"]):
            continue
        if n_bands == 1:
            res[0][v][0].append(p["res_texel"])
            res[0][v][1].append(p["res_pixel"])
            res[0][v][2].append(p["res_weight"])
        else:
            tband = (p["res_texel"] // tex_w) // band_h
            for tb in np.unique(tband):
                sel = tband == tb
                res[tb][v][0].append(p["res_texel"][sel]
                                     - tb * band_h * tex_w)
                res[tb][v][1].append(p["res_pixel"][sel])
                res[tb][v][2].append(p["res_weight"][sel])
    counts = [sum(len(a) for a in res[b][v][0])
              for b in range(n_bands) for v in range(nv)]
    if cap is None:
        cap = max(1, max(counts))
        cap = int(2 ** np.ceil(np.log2(cap)))
    if max(counts) > cap:
        raise ValueError(f"residual cap {cap} < count {max(counts)}")

    def res_band(b):
        rt = np.zeros((nv, cap), np.int32)
        rp = np.zeros((nv, cap), np.int32)
        rw_ = np.zeros((nv, cap), np.float32)
        for v in range(nv):
            if res[b][v][0]:
                t = np.concatenate(res[b][v][0])
                rt[v, :len(t)] = t
                rp[v, :len(t)] = np.concatenate(res[b][v][1])
                rw_[v, :len(t)] = np.concatenate(res[b][v][2])
        return rt, rp, rw_

    def stack_bands(rows, keys):
        return {k: np.stack([np.stack([np.asarray(d[k], np.int32)
                                       for d in rows[b]])
                             for b in range(n_bands)])
                for k in keys}

    g = stack_bands(gs, gk)
    s = stack_bands(ss, sk)
    rs = [res_band(b) for b in range(n_bands)]
    labels = np.stack([p["labels_img"] for p in views])  # [V, H, W]
    if n_bands == 1:
        g = {k: v[0] for k, v in g.items()}
        s = {k: v[0] for k, v in s.items()}
        rt, rp, rw_ = rs[0]
    else:
        rt = np.stack([r[0] for r in rs])
        rp = np.stack([r[1] for r in rs])
        rw_ = np.stack([r[2] for r in rs])
        # one tiled copy of the labels per band: every schedule leaf then has
        # a leading band axis and shard_map specs stay uniform
        labels = np.repeat(labels[None], n_bands, axis=0)

    return PlanArrays(
        labels=labels,
        g_ids=g["ids"], g_oy=g["oy"], g_ox=g["ox"], g_sub=g["sub"],
        g_load=g["load"], g_acc=g["acc"], g_alive=g["alive"],
        s_ids=s["ids"], s_oy=s["oy"], s_ox=s["ox"], s_sub=s["sub"],
        s_load=s["load"], s_store=s["store"], s_alive=s["alive"],
        res_texel=rt, res_pixel=rp, res_weight=rw_,
        tile_h=tile_h, tile_w=tile_w,
        region_h=int(region_h), region_w=int(region_w),
        tex_h_global=int(tex_h) if n_bands > 1 else 0)


def plan_arrays_for_views(uv_views, tex_h, tex_w, cap=None, region_h=None,
                          region_w=None, tile_h=TILE_H, tile_w=TILE_W,
                          weight_masks=None) -> PlanArrays:
    """Batched plan for ``uv_views [V, H, W, 2]`` (numpy).

    Args:
        weight_masks: optional ``[V, H, W]`` bool — True where the pixel's
            gradient may be nonzero (see data/grad_masks.py). Entries that
            are False everywhere are dropped from the splat schedule.
        region_h/w: override the automatic window sizing (tests).
    """
    uv_views = np.asarray(uv_views)
    if region_h is None or region_w is None:
        rh, rw = choose_region(uv_views, tex_h, tex_w, tile_h, tile_w)
        region_h, region_w = (region_h or rh), (region_w or rw)
    region_h, region_w = effective_region(tex_h, tex_w, region_h, region_w)
    return _assemble_plan(uv_views, tex_h, tex_w, 1, cap, region_h, region_w,
                          tile_h, tile_w, weight_masks)


def plan_arrays_banded(uv_views, tex_h, tex_w, n_bands, cap=None,
                       tile_h=TILE_H, tile_w=TILE_W,
                       weight_masks=None) -> PlanArrays:
    """Atlas-sharded plan: the atlas is split into ``n_bands`` row bands
    (chip d owns rows [d*H/D, (d+1)*H/D)); every schedule/residual array
    gains a leading band axis so a shard_map over the atlas axis slices it.

    Windows never cross a band (entries are owned by the band holding their
    footprint's center and clamped into it; the overflow rides the residual
    machinery), so no halo exchange is needed in the hot path: each chip
    gathers/splats only its band, partial per-pixel gathers are psum'd, and
    residual contributions are routed to the band that owns their texel.
    Window origins stay GLOBAL atlas rows (the kernels subtract the chip's
    band offset for the DMA); residual texel indices are band-LOCAL.
    """
    uv_views = np.asarray(uv_views)
    assert tex_h % n_bands == 0 and (tex_h // n_bands) % ALIGN_H == 0, \
        (tex_h, n_bands)
    band_h = tex_h // n_bands
    region_h, region_w = choose_region(uv_views, tex_h, tex_w, tile_h,
                                       tile_w, max_region_h=band_h)
    return _assemble_plan(uv_views, tex_h, tex_w, n_bands, cap, region_h,
                          region_w, tile_h, tile_w, weight_masks)
