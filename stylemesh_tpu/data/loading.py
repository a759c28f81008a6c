"""View loading: files -> ViewBatch tensors, plus a packed per-scene cache.

Replicates the reference ``__getitem__`` pixel path
(/root/reference/data/abstract_dataset.py:270-345) including its exact resize
semantics (PIL bicubic for RGB, cv2 INTER_LINEAR for depth arrays, cv2
INTER_NEAREST for angle, PIL NEAREST for masks) — these run on host CPU.

TPU-first delta: the reference re-decodes and re-computes every view each
epoch in DataLoader workers; here :class:`SceneCache` does it once per scene
into packed numpy arrays, so each train step is a zero-copy slice + device
put. Per view at the full 4-level pyramid this is ~13 MB, i.e. a few GB for
the largest scenes — cacheable in host RAM.
"""

import dataclasses
import hashlib
import os
from typing import List, Optional, Sequence

import cv2
import numpy as np
from PIL import Image

from stylemesh_tpu.data.depth_level import calculate_depth_level
from stylemesh_tpu.data.schema import ViewBatch
from stylemesh_tpu.data.scenes import SceneSpec
from stylemesh_tpu.ops.color import _IMAGENET_MEAN_BGR


def gatys_pre_np(rgb01):
    """Host-side Gatys preprocessing on a [H, W, 3] RGB [0,1] array."""
    bgr = rgb01[..., ::-1].astype(np.float32)
    mean = np.asarray(_IMAGENET_MEAN_BGR, dtype=np.float32)
    return (bgr - mean) * 255.0


def _resize_size_for(rgb_size, resize_size):
    """int -> height-matched (w, h); tuple passes through (PIL (w,h) order).

    Mirrors abstract_dataset.py:291-297.
    """
    if isinstance(resize_size, int):
        w, h = rgb_size
        h_new = resize_size
        w_new = round(w * h_new / h)
        return (w_new, h_new)
    return resize_size


def load_extrinsics(path):
    with open(path) as f:
        rows = [[float(v) for v in line.split(" ")] for line in f if line.strip()]
    return np.asarray(rows, dtype=np.float32)


def rescale_intrinsics(intrinsics, from_size, to_size):
    """abstract_dataset.py:257-265 (sizes are (w, h))."""
    if tuple(from_size) == tuple(to_size) or from_size[0] == 0:
        return np.asarray(intrinsics, dtype=np.float32)
    k = np.array(intrinsics, dtype=np.float32)
    k[0, 0] = k[0, 0] / from_size[0] * to_size[0]
    k[1, 1] = k[1, 1] / from_size[1] * to_size[1]
    k[0, 2] = k[0, 2] / from_size[0] * to_size[0]
    k[1, 2] = k[1, 2] / from_size[1] * to_size[1]
    return k


@dataclasses.dataclass
class View:
    """One loaded view, channel-last numpy (pre-batched ViewBatch fields)."""

    rgb: np.ndarray
    uv: List[np.ndarray]
    mask: np.ndarray
    depth: np.ndarray
    rounded_depth_level: np.ndarray
    other_depth_level: np.ndarray
    depth_level_weight: np.ndarray
    depth_level: np.ndarray
    angle_guidance: np.ndarray
    angle_degrees: np.ndarray
    extrinsics: np.ndarray
    intrinsics: np.ndarray
    idx: int


def load_view(spec: SceneSpec, idx: int, resize_size=256) -> View:
    """Load + preprocess one view exactly as the reference __getitem__."""
    rgb_img = Image.open(spec.rgb[idx])
    target = _resize_size_for(rgb_img.size, resize_size)

    # depth (always ends up an ndarray; sensor png / divisor or baked npy)
    if not spec.rendered_depth:
        depth = np.asarray(Image.open(spec.depth[idx])) / spec.depth_divisor
    else:
        depth = np.load(spec.depth[idx])[:, :, 0]
    depth = np.asarray(depth, dtype=np.float32)

    # uv pyramid at native resolutions
    uv_raw = [np.load(spec.uv[level][idx]) for level in range(len(spec.uv))]

    # mask from the highest-res uv map (+ depth gate for ScanNet),
    # scannet_dataset.py:308-328
    top = uv_raw[-1]
    mask = (top[:, :, 0] != 0) | (top[:, :, 1] != 0)
    if spec.mask_uses_depth:
        d = cv2.resize(depth, (mask.shape[1], mask.shape[0]),
                       interpolation=cv2.INTER_LINEAR)
        mask = mask & (d > 0)
    mask_img = Image.fromarray(mask)

    angle = np.load(spec.angle[idx])[:, :, :1].astype(np.float32)

    # resizes (reference semantics: PIL bicubic rgb, cv2 linear depth,
    # cv2 nearest angle, PIL nearest mask)
    rgb_img = rgb_img.resize(target, Image.Resampling.BICUBIC)
    depth = cv2.resize(depth, target, interpolation=cv2.INTER_LINEAR)
    angle = cv2.resize(angle, target, interpolation=cv2.INTER_NEAREST)
    mask_img = mask_img.resize(target, Image.Resampling.NEAREST)

    intr = rescale_intrinsics(spec.intrinsics, spec.intrinsics_size, rgb_img.size)
    extr = load_extrinsics(spec.extrinsics[idx])

    cont, rounded, other, weight = calculate_depth_level(
        depth, spec.levels, min_depth=spec.min_pyramid_depth)

    rgb01 = np.asarray(rgb_img, dtype=np.float32) / 255.0
    rgb = gatys_pre_np(rgb01[..., :3])

    uv_grids = [u[..., :2].astype(np.float32) * 2.0 - 1.0 for u in uv_raw]
    mask_np = (np.asarray(mask_img) > 0).astype(np.float32)[..., None]
    cos = np.clip(angle, -1.0, 1.0)
    degrees = np.degrees(np.arccos(cos)).astype(np.float32)

    return View(
        rgb=rgb,
        uv=uv_grids,
        mask=mask_np,
        depth=depth[..., None],
        rounded_depth_level=rounded[..., None].astype(np.float32),
        other_depth_level=other[..., None].astype(np.float32),
        depth_level_weight=weight[..., None],
        depth_level=cont[..., None],
        angle_guidance=cos[..., None],
        angle_degrees=degrees[..., None],
        extrinsics=extr,
        intrinsics=intr,
        idx=idx,
    )


def views_to_batch(views: Sequence[View]) -> ViewBatch:
    num_levels = len(views[0].uv)
    return ViewBatch(
        rgb=np.stack([v.rgb for v in views]),
        uv=tuple(np.stack([v.uv[l] for v in views]) for l in range(num_levels)),
        mask=np.stack([v.mask for v in views]),
        depth=np.stack([v.depth for v in views]),
        rounded_depth_level=np.stack([v.rounded_depth_level for v in views]),
        other_depth_level=np.stack([v.other_depth_level for v in views]),
        depth_level_weight=np.stack([v.depth_level_weight for v in views]),
        angle_guidance=np.stack([v.angle_guidance for v in views]),
        angle_degrees=np.stack([v.angle_degrees for v in views]),
        extrinsics=np.stack([v.extrinsics for v in views]),
        intrinsics=np.stack([v.intrinsics for v in views]),
        idx=np.asarray([v.idx for v in views], dtype=np.int32),
        depth_level=np.stack([v.depth_level for v in views]),
    )


def _save_plan_cache(path, view_plans):
    """Serialize [level][layer] PlanArrays|None to one flat npz (atomic;
    per-process temp name so concurrent runs of the same scene can't
    interleave writes — last replace wins with a complete file)."""
    arrs = {}
    for li, per_layer in enumerate(view_plans):
        for ti, plan in enumerate(per_layer):
            if plan is None:
                continue
            for f in dataclasses.fields(plan):
                arrs[f"l{li}t{ti}_{f.name}"] = np.asarray(getattr(plan, f.name))
    tmp = f"{path}.{os.getpid()}.tmp.npz"
    try:
        np.savez(tmp, **arrs)
        os.replace(tmp, path)
    except OSError:  # disk-full etc. — the cache is best-effort
        try:
            os.remove(tmp)
        except OSError:
            pass


def _load_plan_cache(path, n_levels, plan_layer_sizes, skip_levels=()):
    """Inverse of :func:`_save_plan_cache`; None on any mismatch."""
    from stylemesh_tpu.ops.splat_plan import PlanArrays

    meta_ints = {"tile_h", "tile_w", "region_h", "region_w", "tex_h_global"}
    try:
        out = []
        with np.load(path) as z:
            for li in range(n_levels):
                if li in skip_levels:
                    out.append([None] * len(plan_layer_sizes))
                    continue
                per = []
                for ti, hw in enumerate(plan_layer_sizes):
                    if hw is None:
                        per.append(None)
                        continue
                    kw = {}
                    for f in dataclasses.fields(PlanArrays):
                        k = f"l{li}t{ti}_{f.name}"
                        if k not in z:
                            return None
                        kw[f.name] = (int(z[k]) if f.name in meta_ints
                                      else z[k])
                    per.append(PlanArrays(**kw))
                out.append(per)
        return out
    except Exception:
        return None


class SceneCache:
    """Pack every view of a scene once; serve batches as array slices.

    The reference's hot loop re-loads ~13 MB of npy per view per epoch in
    4 DataLoader workers; a packed cache turns batch assembly into fancy
    indexing, which is what a 100+-views-per-second TPU step needs.
    """

    def __init__(self, spec: SceneSpec, resize_size=256, indices=None,
                 verbose=False):
        self.spec = spec
        self.indices = list(range(spec.num_frames)) if indices is None else list(indices)
        views = []
        for i in self.indices:
            views.append(load_view(spec, i, resize_size))
            if verbose and len(views) % 50 == 0:
                print(f"cached {len(views)}/{len(self.indices)} views")
        self._batch_all = views_to_batch(views)
        self._pos_of = {idx: p for p, idx in enumerate(self.indices)}

    @property
    def num_views(self):
        return len(self.indices)

    @property
    def levels(self):
        return self.spec.levels

    def attach_splat_plans(self, layer_sizes, use_angle_weight=False,
                           use_depth_scaling=False, n_bands=1,
                           skip_levels=()):
        """Precompute Pallas splat plans for every cached view and texture
        layer (see ops/splat_plan.py). ``layer_sizes``: [(h, w)] per texture
        layer. Plans are constants per scene; batches then assemble them by
        row-slicing the schedule arrays — no per-step host work.

        Pass the pipeline's gradient-reweighting flags so tiles with
        provably-zero gradients are dropped from the splat schedules
        (data/grad_masks.py). Plans built with different flags than the
        training config would silently drop live gradients — keep in sync.

        ``n_bands > 1`` builds atlas-banded plans (leading band axis on every
        schedule array) for :class:`parallel.atlas.AtlasShardedPipeline` —
        one band per chip of the atlas mesh axis.

        ``skip_levels``: pyramid levels the pipeline will statically skip
        (optimize.scene_skip_levels) — no plans are built, cached, sliced,
        or device-transferred for them.
        """
        from stylemesh_tpu.data.grad_masks import grad_weight_masks
        from stylemesh_tpu.ops.splat_plan import (
            plan_arrays_banded,
            plan_arrays_for_views,
        )

        def eligible(h, w):
            if h % 8 or w % 128:
                return False
            return n_bands == 1 or (h % n_bands == 0
                                    and (h // n_bands) % 8 == 0)

        self._plan_layer_sizes = [
            (h, w) if eligible(h, w) else None for (h, w) in layer_sizes
        ]
        b = self._batch_all
        level_shapes = [tuple(u.shape[1:3]) for u in b.uv]
        wmasks = grad_weight_masks(b, level_shapes, use_angle_weight,
                                   use_depth_scaling)
        # plans are pure functions of (uv maps, weight masks, layer sizes,
        # planner version) — all scene constants — so they cache to disk:
        # a warm re-run of a scene skips the ~minutes of host-side planning
        # entirely (the single biggest non-compile cold cost on this host)
        cache_path = self._plan_cache_path(layer_sizes, wmasks, n_bands,
                                           skip_levels)
        if cache_path is not None and os.path.exists(cache_path):
            cached = _load_plan_cache(cache_path, len(b.uv),
                                      self._plan_layer_sizes, skip_levels)
            if cached is not None:
                self._view_plans = cached
                return
        # [level][layer] -> PlanArrays over all cached views | None
        self._view_plans = []
        for li, uv in enumerate(b.uv):
            if li in skip_levels:  # statically-skipped: never planned
                self._view_plans.append([None] * len(self._plan_layer_sizes))
                continue
            per_layer = []
            for hw in self._plan_layer_sizes:
                if hw is None:
                    per_layer.append(None)
                    continue
                wm = None if wmasks is None else wmasks[li]
                if n_bands > 1:
                    per_layer.append(plan_arrays_banded(
                        np.asarray(uv), hw[0], hw[1], n_bands,
                        weight_masks=wm))
                else:
                    per_layer.append(plan_arrays_for_views(
                        np.asarray(uv), hw[0], hw[1], weight_masks=wm))
            self._view_plans.append(per_layer)
        if cache_path is not None:
            _save_plan_cache(cache_path, self._view_plans)

    def _plan_cache_path(self, layer_sizes, wmasks, n_bands,
                         skip_levels=()):
        """Content-addressed path for the on-disk plan cache (None =
        disabled via STYLEMESH_PLAN_CACHE_DIR=0). The key hashes the full
        uv/mask bytes plus every planner input and the planner version, so a
        stale hit is impossible short of a hash collision."""
        from stylemesh_tpu.ops.splat_plan import PLANNER_VERSION

        root = os.environ.get(
            "STYLEMESH_PLAN_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "stylemesh_tpu",
                         "plan_cache"))
        if root in ("", "0", "off"):
            return None
        h = hashlib.sha1()
        h.update(repr((PLANNER_VERSION, [tuple(s) for s in layer_sizes],
                       int(n_bands), wmasks is None,
                       sorted(skip_levels))).encode())
        for uv in self._batch_all.uv:
            a = np.ascontiguousarray(np.asarray(uv, np.float32))
            h.update(repr(a.shape).encode())
            h.update(a.tobytes())
        if wmasks is not None:
            for m in wmasks:
                h.update(np.ascontiguousarray(np.asarray(m, bool)).tobytes())
        try:
            os.makedirs(root, exist_ok=True)
        except OSError:  # unwritable cache root: plan without a cache
            return None
        return os.path.join(root, h.hexdigest() + ".npz")

    def _assemble_plans(self, pos):
        import jax

        levels = []
        for per_layer in self._view_plans:
            layer_plans = []
            for plan in per_layer:
                if plan is None:
                    layer_plans.append(None)
                    continue
                if plan.tex_h_global:  # banded: view axis is axis 1
                    layer_plans.append(jax.tree.map(lambda a: a[:, pos], plan))
                else:
                    layer_plans.append(jax.tree.map(lambda a: a[pos], plan))
            levels.append(tuple(layer_plans))
        return tuple(levels)

    def get_batch(self, indices) -> ViewBatch:
        """Batch of dataset indices (positions resolved via the cache)."""
        pos = np.asarray([self._pos_of[i] for i in indices], dtype=np.int64)
        b = self._batch_all
        take = lambda x: x[pos]
        splat_plans = (self._assemble_plans(pos)
                       if getattr(self, "_view_plans", None) else None)
        return ViewBatch(
            splat_plans=splat_plans,
            rgb=take(b.rgb),
            uv=tuple(take(u) for u in b.uv),
            mask=take(b.mask),
            depth=take(b.depth),
            rounded_depth_level=take(b.rounded_depth_level),
            other_depth_level=take(b.other_depth_level),
            depth_level_weight=take(b.depth_level_weight),
            angle_guidance=take(b.angle_guidance),
            angle_degrees=take(b.angle_degrees),
            extrinsics=take(b.extrinsics),
            intrinsics=take(b.intrinsics),
            idx=take(b.idx),
            depth_level=take(b.depth_level),
        )
