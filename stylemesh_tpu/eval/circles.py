"""Circle-uniformity metric (paper Tab. 2 / Fig. 8).

Re-implements /root/reference/scripts/eval/measure_circles.py: the scene is
styled with a uniform red-circles texture
(styles/simple_shapes/circles_uniform_small.png); rendered circles are then
detected per frame (HSV red filter -> contours -> convexity filter ->
ellipse fit), and the method's 3D-uniformity is quantified by

- the distribution of circle radii vs the per-frame median (4 buckets at
  factor ``t``), in 2D pixels and in 3D world units (ellipse endpoints
  unprojected via depth),
- correlation of radius vs depth (a perfect 3D-uniform stylization has ~0 in
  3D, strongly negative in 2D pixels), and
- correlation of ellipse stretch vs viewing angle.

Host-side cv2/numpy (this is an offline metric, not a training-path op).
"""

import json
import os
from os.path import join

import cv2
import numpy as np
from scipy.spatial import distance as dist


def filter_hsv_red(src_bgr):
    """Keep the two red hue bands (measure_circles.py:25-43)."""
    hsv = cv2.cvtColor(src_bgr, cv2.COLOR_BGR2HSV)
    lower = np.array([0, int(0.6 * 255), int(0.6 * 255)])
    upper = np.array([15, 255, 255])
    mask = cv2.inRange(hsv, lower, upper)
    lower = np.array([160, int(0.4 * 255), int(0.4 * 255)])
    upper = np.array([179, 255, 255])
    mask += cv2.inRange(hsv, lower, upper)
    return cv2.bitwise_and(src_bgr, src_bgr, mask=mask)


def _order_points(pts):
    x_sorted = pts[np.argsort(pts[:, 0]), :]
    left = x_sorted[:2, :][np.argsort(x_sorted[:2, 1]), :]
    right = x_sorted[2:, :]
    tl, bl = left
    d = dist.cdist(tl[np.newaxis], right, "euclidean")[0]
    br, tr = right[np.argsort(d)[::-1], :]
    return tl, tr, br, bl


def _ellipse_stats(a, b):
    radius = (a / 2.0 + b / 2.0) / 2.0
    stretch = abs(a / b) if a > b else abs(b / a)
    return radius, stretch, a * b


def _clamp(p, w, h):
    x, y = int(round(p[0])), int(round(p[1]))
    return max(0, min(x, w - 1)), max(0, min(y, h - 1))


def _in_range(p, w, h):
    x, y = round(p[0]), round(p[1])
    return 0 <= x < w and 0 <= y < h


def _corr_from_lookup(centers, ys, lut, filter_zero=True):
    xs = [float(lut[p[1], p[0], 0]) for p in centers]
    xy = sorted(zip(xs, ys), key=lambda pair: pair[0])
    if filter_zero:
        xy = [i for i in xy if i[0] != 0]
    if len(xy) < 2:
        return float("nan"), [], []
    xs = [i[0] for i in xy]
    ys = [i[1] for i in xy]
    return float(np.corrcoef(np.array([xs, ys]))[0, 1]), xs, ys


def _median_buckets(radii, t, suffix):
    stats = {f"{k}{suffix}": 0 for k in ("smallest", "small", "large", "largest")}
    n = len(radii)
    if n == 0:
        return {k: float("nan") for k in stats}, 0
    med = np.median(np.asarray(radii))
    for r in radii:
        if r < med / t:
            k = "smallest"
        elif r < med:
            k = "small"
        elif med < r < med * t:
            k = "large"
        else:
            k = "largest"
        stats[f"{k}{suffix}"] += 1
    return {k: v / n for k, v in stats.items()}, n


def detect_ellipses(image_bgr, max_hull_deviation=2.0, max_stretch=10.0,
                    min_size=10.0, max_size=10000.0):
    """HSV red filter -> denoised binary -> contours -> convexity-filtered
    ellipse fits (measure_circles.py:185-290). Returns list of
    (ellipse, radius, stretch)."""
    hsv_filtered = filter_hsv_red(image_bgr)
    gray = cv2.cvtColor(hsv_filtered, cv2.COLOR_BGR2GRAY)
    _, bw = cv2.threshold(gray, 40, 255, cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    bw = cv2.fastNlMeansDenoising(bw, h=100)
    _, bw = cv2.threshold(bw, 40, 255, cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    contours, _ = cv2.findContours(bw, cv2.RETR_TREE, cv2.CHAIN_APPROX_NONE)

    out = []
    for cnt in contours:
        try:
            hull = cv2.convexHull(cnt, returnPoints=False)
            defects = cv2.convexityDefects(cnt, hull)
            max_dev = 0.0
            if defects is not None and len(defects):
                max_dev = float(np.max(np.asarray(defects).reshape(-1, 4)[:, 3])) / 256.0
            if max_dev > max_hull_deviation:
                continue
            ellipse = cv2.fitEllipse(cnt)
            w, h = ellipse[1]
            if w == 0 or h == 0:
                continue
            radius, stretch, size = _ellipse_stats(w, h)
            if stretch < max_stretch and min_size < size < max_size:
                out.append((ellipse, radius, stretch))
        except cv2.error as e:
            msg = str(e)
            ok = ("-201:Incorrect size of input array" in msg
                  or "The convex hull indices are not monotonous" in msg)
            if not ok:
                raise
    return out


def measure_frame(image_bgr, depth, angle_degrees, world_coords, t=1.5):
    """Per-frame circle statistics (measure_circles.py:185-400).

    Args:
        image_bgr: ``[H, W, 3]`` uint8 styled frame (BGR, cv2 layout).
        depth: ``[H, W, 1]`` metric depth.
        angle_degrees: ``[H, W, 1]`` viewing angle.
        world_coords: ``[H, W, >=3]`` unprojected world points per pixel.
    Returns:
        (stats dict, n detected circles).
    """
    img_h, img_w = image_bgr.shape[:2]
    depth2 = depth.squeeze()

    detections = detect_ellipses(image_bgr)

    centers, h_edges, v_edges, radii, stretches = [], [], [], [], []
    for ellipse, radius, stretch in detections:
        box = cv2.boxPoints(ellipse)
        tl, tr, br, bl = _order_points(box)
        half_tr_br = tr + (br - tr) / 2.0
        half_tl_bl = tl + (bl - tl) / 2.0
        half_tl_tr = tl + (tr - tl) / 2.0
        half_bl_br = bl + (br - bl) / 2.0
        he = _clamp(half_tr_br if _in_range(half_tr_br, img_w, img_h)
                    else half_tl_bl, img_w, img_h)
        ve = _clamp(half_tl_tr if _in_range(half_tl_tr, img_w, img_h)
                    else half_bl_br, img_w, img_h)
        c = _clamp(ellipse[0], img_w, img_h)
        if not all(depth2[p[1], p[0]] > 0 for p in (c, he, ve)):
            continue
        centers.append(c)
        h_edges.append(he)
        v_edges.append(ve)
        radii.append(radius)
        stretches.append(stretch)

    # 3D: unproject center + edge midpoints, measure world-space axes
    radii_3d, stretches_3d, centers_3d = [], [], []
    for c, he, ve in zip(centers, h_edges, v_edges):
        cc = world_coords[c[1], c[0], :3]
        a = np.linalg.norm(world_coords[he[1], he[0], :3] - cc)
        b = np.linalg.norm(world_coords[ve[1], ve[0], :3] - cc)
        if a == 0 or b == 0:
            continue
        radius, stretch, _ = _ellipse_stats(a, b)
        radii_3d.append(radius)
        stretches_3d.append(stretch)
        centers_3d.append(c)

    stats, n = _median_buckets(radii, t, "_2D")
    stats3, _ = _median_buckets(radii_3d, t, "_3D")
    stats.update(stats3)

    corr, _, _ = _corr_from_lookup(centers, radii, depth)
    stats["corr_depth_2D"] = corr
    corr, _, _ = _corr_from_lookup(centers_3d, radii_3d, depth)
    stats["corr_depth_3D"] = corr
    corr, _, ys = _corr_from_lookup(centers, stretches, angle_degrees)
    stats["corr_angle_2D"] = corr
    stats["mean_stretch_2D"] = float(np.mean(ys)) if ys else float("nan")
    stats["median_stretch_2D"] = float(np.median(ys)) if ys else float("nan")
    stats["std_stretch_2D"] = float(np.std(ys)) if ys else float("nan")
    corr, _, ys = _corr_from_lookup(centers_3d, stretches_3d, angle_degrees)
    stats["corr_angle_3D"] = corr
    stats["mean_stretch_3D"] = float(np.mean(ys)) if ys else float("nan")
    stats["median_stretch_3D"] = float(np.median(ys)) if ys else float("nan")
    stats["std_stretch_3D"] = float(np.std(ys)) if ys else float("nan")
    return stats, n


def measure_circles_for_scene(scene_cache, styled_dir, t=1.5, out_path=None):
    """Aggregate the per-frame statistics over a scene, weighted by circle
    count (measure_circles.py:403-479)."""
    import jax.numpy as jnp

    from stylemesh_tpu.geometry.project import unproject

    b = scene_cache._batch_all
    totals = {}
    n_total = 0
    for p, idx in enumerate(scene_cache.indices):
        img = cv2.imread(join(styled_dir, f"{idx}.png"))
        if img is None:
            continue
        depth = np.asarray(b.depth[p])
        if img.shape[:2] != depth.shape[:2]:
            img = cv2.resize(img, (depth.shape[1], depth.shape[0]))
        coords = np.asarray(unproject(
            jnp.asarray(b.extrinsics[p:p + 1]), jnp.asarray(b.intrinsics[p:p + 1]),
            jnp.asarray(depth[None])))[0]
        stats, n = measure_frame(img, depth, np.asarray(b.angle_degrees[p]),
                                 coords, t=t)
        if n == 0:
            continue
        n_total += n
        for k, v in stats.items():
            if not np.isnan(v):
                totals[k] = totals.get(k, 0.0) + v * n
    result = {k: v / n_total for k, v in totals.items()} if n_total else {}
    result["n_circles"] = n_total
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    return result
