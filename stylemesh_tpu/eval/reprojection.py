"""Reprojection-consistency evaluation (paper Tab. 1 metric).

Re-implements /root/reference/scripts/eval/eval_image_folders.py:207-413 on
top of the packed scene cache: for every frame, warp the styled image of a
paired frame into the current view using depth + poses (4-corner depth-
agreement occlusion masking), then accumulate

- MSE over the masked pixels (global sum-of-squares / count, exactly
  torchmetrics.MeanSquaredError's accumulation), and
- an LPIPS perceptual distance over the masked images (summed over frames,
  as the reference sums the per-frame values :393-400),

for three pairings: random (within ±pair_threshold), short (deterministic
±1) and long (deterministic ±10).
"""

import json
import os
import random
from datetime import datetime
from os.path import join

import jax.numpy as jnp
import numpy as np
from PIL import Image

from stylemesh_tpu.data.loading import gatys_pre_np
from stylemesh_tpu.geometry.project import reproject
from stylemesh_tpu.ops.color import gatys_post


def sample_pairs(n, threshold=10, rng=None):
    """Random partner within ±threshold (eval_image_folders.py:185-193)."""
    rng = rng or random
    pairs = []
    for i in range(n):
        start = max(0, i - threshold)
        end = min(n, i + threshold)
        pairs.append(rng.choice([j for j in range(start, end) if j != i]))
    return pairs


def sample_pairs_det(n, threshold=10):
    """Deterministic partner at -threshold (or +threshold at the left edge),
    eval_image_folders.py:196-204."""
    pairs = []
    for i in range(n):
        left, right = i - threshold, i + threshold
        pairs.append(left if left >= 0 else right if right < n else i)
    return pairs


def _load_styled(path, hw):
    img = Image.open(path).convert("RGB")
    if (img.size[1], img.size[0]) != hw:
        img = img.resize((hw[1], hw[0]), Image.Resampling.BILINEAR)
    return np.asarray(img, dtype=np.float32) / 255.0


class _MSEAccum:
    """torchmetrics.MeanSquaredError semantics: global Σ(a-b)²/N."""

    def __init__(self):
        self.sq = 0.0
        self.n = 0

    def update(self, a, b):
        d = np.asarray(a, np.float64) - np.asarray(b, np.float64)
        self.sq += float(np.sum(d * d))
        self.n += d.size

    def compute(self):
        return self.sq / max(self.n, 1)


def eval_reprojection_consistency(scene_cache, styled_dir, out_dir=None,
                                  seed=42, pair_threshold=20,
                                  pair_threshold_short=1,
                                  pair_threshold_long=10, lpips_fn=None,
                                  save_images=True, styled_paths=None,
                                  suffix=""):
    """Returns the metric dict and writes ``<timestamp>_output.json``.

    Styled frames are read from ``styled_dir`` as ``<dataset idx>.png`` (the
    output of ``render_styled_frames``) unless explicit ``styled_paths`` are
    given (the standalone folder CLI); rgb/depth/pose come from the cache.
    The metric operates in Gatys space like the reference (styled images are
    pre()-transformed before the MSE, eval_image_folders.py:85-92).

    ``save_images`` writes the reference's full per-frame diagnostic set
    (eval_image_folders.py:333-351): rgb, styled, residual, and
    styled_other / styled_reprojected for all three pairings — the images
    the paper's qualitative claims are audited with. ``suffix`` tags the
    output files (multi-style sweeps run one eval per style).
    """
    b = scene_cache._batch_all
    n = scene_cache.num_views
    hw = b.rgb.shape[1:3]
    out_dir = out_dir or styled_dir
    stamp = datetime.now().strftime("%d.%m.%Y-%H:%M:%S")
    image_dir = join(out_dir, f"eval_image_data_{stamp}{suffix}")
    if save_images:
        os.makedirs(image_dir, exist_ok=True)

    rng = random.Random(seed)
    pairs = sample_pairs(n, pair_threshold, rng)
    short_pairs = sample_pairs_det(n, pair_threshold_short)
    long_pairs = sample_pairs_det(n, pair_threshold_long)

    if styled_paths is None:
        styled_paths = [join(styled_dir, f"{idx}.png")
                        for idx in scene_cache.indices]
    styled = np.stack([
        gatys_pre_np(_load_styled(p, hw)) for p in styled_paths
    ])
    depth = np.asarray(b.depth)
    poses = np.asarray(b.extrinsics)
    intr = np.asarray(b.intrinsics)

    accums = {"reprojection": _MSEAccum(), "reprojection_short": _MSEAccum(),
              "reprojection_long": _MSEAccum()}
    lpips_sums = {"reprojection_lpips": 0.0, "reprojection_short_lpips": 0.0,
                  "reprojection_long_lpips": 0.0}

    # One batched reproject per pairing instead of one jit dispatch per frame
    # (the reference loops frames serially, eval_image_folders.py:320-400; a
    # 24-frame eval here used to pay 72 reproject dispatches + 144 LPIPS
    # calls at batch 1 — Python-serial host dispatch dominated the post
    # chain's wall-clock). LPIPS runs in chunks to bound HBM.
    def eval_pairing(pair_idx, key, chunk=8):
        j = np.asarray(pair_idx)
        warped_all, mask_all = [], []
        for c0 in range(0, n, chunk):
            ii = np.arange(c0, min(c0 + chunk, n))
            jj = j[ii]
            mask_other = (depth[jj] > 0).astype(np.float32)
            warped, mask = reproject(
                jnp.asarray(poses[ii]), jnp.asarray(poses[jj]),
                jnp.asarray(intr[ii]), jnp.asarray(depth[ii]),
                jnp.asarray(depth[jj]), jnp.asarray(styled[jj]),
                jnp.asarray(mask_other))
            warped_all.append(np.asarray(warped))
            mask_all.append(np.asarray(mask)[..., 0].astype(bool))
        warped = np.concatenate(warped_all)
        mask = np.concatenate(mask_all)
        m3 = mask[..., None]
        d = (styled - warped) * m3
        accums[key].sq += float(np.sum(d.astype(np.float64) ** 2))
        accums[key].n += int(mask.sum()) * styled.shape[-1]
        if lpips_fn is not None:
            for c0 in range(0, n, chunk):
                sl = slice(c0, min(c0 + chunk, n))
                a01 = np.asarray(gatys_post(jnp.asarray(styled[sl] * m3[sl])))
                b01 = np.asarray(gatys_post(jnp.asarray(warped[sl] * m3[sl])))
                lpips_sums[key + "_lpips"] += float(
                    np.sum(np.asarray(lpips_fn(a01, b01))))
        return warped, mask

    warped_r, mask_r = eval_pairing(pairs, "reprojection")
    warped_s, _ = eval_pairing(short_pairs, "reprojection_short")
    warped_l, _ = eval_pairing(long_pairs, "reprojection_long")

    def save_img(arr_gatys, name):
        img = np.clip(np.asarray(gatys_post(jnp.asarray(arr_gatys))), 0, 1)
        Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(
            join(image_dir, name))

    if save_images:
        for i in range(n):
            # the reference's 9-image per-frame diagnostic set
            # (eval_image_folders.py:333-351)
            m3 = mask_r[i][..., None]
            save_img(np.abs(styled[i] * m3 - warped_r[i] * m3),
                     f"residual_image_{i}.jpg")
            save_img(np.asarray(b.rgb[i]), f"rgb_{i}.jpg")
            save_img(styled[i], f"styled_{i}.jpg")
            save_img(styled[pairs[i]], f"styled_other_{i}_{pairs[i]}.jpg")
            save_img(warped_r[i], f"styled_reprojected_{i}.jpg")
            save_img(styled[short_pairs[i]],
                     f"styled_other_short_{i}_{short_pairs[i]}.jpg")
            save_img(warped_s[i], f"styled_reprojected_short_{i}.jpg")
            save_img(styled[long_pairs[i]],
                     f"styled_other_long_{i}_{long_pairs[i]}.jpg")
            save_img(warped_l[i], f"styled_reprojected_long_{i}.jpg")

    results = {
        "number_files": n,
        "date_time": stamp,
        "pairs": pairs,
        "short_pairs": short_pairs,
        "long_pairs": long_pairs,
        "lpips_calibrated": getattr(lpips_fn, "calibrated", None),
        "accuracies": {k: a.compute() for k, a in accums.items()},
    }
    if lpips_fn is not None:
        results["accuracies"].update(lpips_sums)
    with open(join(out_dir, f"{stamp}_output{suffix}.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results
