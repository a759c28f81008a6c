"""Tests for eval metrics and post-processing (circles, LPIPS, masking,
video, checkpoints)."""

import os

import cv2
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.eval.circles import detect_ellipses, measure_frame
from stylemesh_tpu.eval.lpips import LPIPSDistance
from stylemesh_tpu.models.texture import Texture
from stylemesh_tpu.models.vgg import init_vgg_params
from stylemesh_tpu.texturing.mask_image import mask_image
from stylemesh_tpu.texturing.mask_texture import compute_texture_mask, mask_texture
from stylemesh_tpu.texturing.video import video_from_files
from stylemesh_tpu.utils.checkpoint import (
    load_texture_npz,
    save_texture_image,
    save_texture_npz,
)

RNG = np.random.default_rng(31)


def _circle_image(h=120, w=160, circles=((40, 40, 10), (100, 80, 20))):
    img = np.zeros((h, w, 3), np.uint8)
    for cx, cy, r in circles:
        cv2.circle(img, (cx, cy), r, (0, 0, 230), -1)  # BGR red
    return img


def test_detect_ellipses_finds_circles():
    img = _circle_image()
    det = detect_ellipses(img)
    assert len(det) == 2
    radii = sorted(r for _, r, _ in det)
    assert 8 <= radii[0] <= 12
    assert 18 <= radii[1] <= 22
    for _, _, stretch in det:
        assert stretch < 1.3


def test_measure_frame_statistics():
    img = _circle_image(circles=((40, 40, 8), (100, 80, 16), (130, 30, 12)))
    h, w = img.shape[:2]
    depth = np.full((h, w, 1), 2.0, np.float32)
    angle = np.full((h, w, 1), 20.0, np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    coords = np.stack([xs * 0.01, ys * 0.01, np.full_like(xs, 2.0, dtype=float),
                       np.ones_like(xs, dtype=float)], -1).astype(np.float32)
    stats, n = measure_frame(img, depth, angle, coords)
    assert n == 3
    buckets = [stats[k] for k in ("smallest_2D", "small_2D", "large_2D", "largest_2D")]
    np.testing.assert_allclose(sum(buckets), 1.0, atol=1e-6)
    # uniform world scale: 3D radii proportional to 2D ones here
    assert stats["mean_stretch_2D"] < 1.5

    # debug mode: annotated image (ellipses drawn -> differs from input) and
    # scatter data behind every correlation
    stats2, n2, dbg = measure_frame(img, depth, angle, coords, debug=True)
    assert n2 == n
    for k in stats:  # nan-tolerant equality (flat-depth corr is nan)
        np.testing.assert_array_equal(np.float64(stats[k]),
                                      np.float64(stats2[k]), err_msg=k)
    assert dbg["image"].shape == img.shape and (dbg["image"] != img).any()
    for k in ("depth_vs_radius_2D", "depth_vs_radius_3D",
              "angle_vs_stretch_2D", "angle_vs_stretch_3D"):
        assert len(dbg["scatter"][k]["x"]) == len(dbg["scatter"][k]["y"]) > 0


def test_lpips_basic_properties():
    params = init_vgg_params(rng=2, scale=0.08)
    d = LPIPSDistance(params)
    a = RNG.random((1, 64, 64, 3)).astype(np.float32)
    b = RNG.random((1, 64, 64, 3)).astype(np.float32)
    assert float(d(a, a)[0]) < 1e-6
    assert float(d(a, b)[0]) > 0
    assert not d.calibrated


def test_texture_mask_and_image_mask():
    uv = np.stack(np.meshgrid(np.linspace(-1, 0, 8), np.linspace(-1, 0, 8),
                              indexing="xy"), -1).astype(np.float32)
    mask = np.ones((8, 8, 1), np.float32)
    tex_mask = compute_texture_mask([uv], [mask], (16, 16), min_fraction=0.5)
    # uv covers only the [-1,0] quadrant -> left-top quarter of the atlas
    assert tex_mask[:8, :8].any()
    assert not tex_mask[12:, 12:].any()
    tex = RNG.random((16, 16, 3)).astype(np.float32)
    masked = mask_texture(tex, tex_mask)
    assert (masked[12:, 12:] == 0).all()

    rgba = mask_image(tex, tex_mask)
    assert rgba.mode == "RGBA"
    alpha = np.asarray(rgba)[..., 3]
    assert (alpha[12:, 12:] == 0).all()


def test_video_from_files(tmp_path):
    from PIL import Image

    paths = []
    for i in [2, 0, 1]:
        p = tmp_path / f"{i}.png"
        Image.fromarray(RNG.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))
    out = video_from_files(paths, str(tmp_path / "out.mp4"), fps=5)
    assert os.path.getsize(out) > 0
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()


def test_texture_npz_roundtrip(tmp_path):
    tex = Texture.create(32, 32, 3, num_layers=2, random_init=True)
    path = str(tmp_path / "tex.npz")
    save_texture_npz(tex, path)
    back = load_texture_npz(path)
    assert back.num_layers == 2
    for a, b in zip(tex.layers, back.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    img_path = save_texture_image(tex, str(tmp_path))
    assert os.path.getsize(img_path) > 0


def test_standalone_eval_cli(tmp_path):
    """python -m stylemesh_tpu.eval over loose folders (the reference's
    eval_image_folders.py surface): MSE + LPIPS keys, JSON written."""
    from PIL import Image as PILImage

    from stylemesh_tpu.eval.__main__ import main as eval_main

    h, w = 24, 32
    for sub in ("rgb", "styled", "pose", "depth"):
        (tmp_path / sub).mkdir()
    rng = np.random.default_rng(5)
    for i in range(4):
        PILImage.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                           ).save(tmp_path / "rgb" / f"{i}.jpg")
        PILImage.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                           ).save(tmp_path / "styled" / f"{i}.png")
        depth = rng.integers(800, 3000, (h, w), dtype=np.uint16)
        PILImage.fromarray(depth.astype(np.int32), mode="I").save(
            tmp_path / "depth" / f"{i}.png")
        pose = np.eye(4)
        pose[0, 3] = 0.02 * i
        with open(tmp_path / "pose" / f"{i}.txt", "w") as f:
            for row in pose:
                f.write(" ".join(str(v) for v in row) + "\n")
    with open(tmp_path / "intr.txt", "w") as f:
        f.write(f"fx_color = 30.0\nfy_color = 30.0\nmx_color = {w/2}\n"
                f"my_color = {h/2}\ncolorWidth = {w}\ncolorHeight = {h}\n")

    results = eval_main([
        "--rgb", str(tmp_path / "rgb"), "--styled", str(tmp_path / "styled"),
        "--pose", str(tmp_path / "pose"), "--depth", str(tmp_path / "depth"),
        "--intrinsics", str(tmp_path / "intr.txt"),
        "--image_size", "16", "--pair_threshold", "2",
        "--out_dir", str(tmp_path / "out")])
    acc = results["accuracies"]
    for k in ("reprojection", "reprojection_short", "reprojection_long",
              "reprojection_lpips", "reprojection_short_lpips",
              "reprojection_long_lpips"):
        assert k in acc and np.isfinite(acc[k]), k
    assert results["lpips_calibrated"] is False
    assert any(f.endswith("_output.json") for f in os.listdir(tmp_path / "out"))
    # the diagnostic dump's rgb frames must be the REAL scene photos, not a
    # shape-only placeholder (flat gray)
    img_dirs = [d for d in os.listdir(tmp_path / "out")
                if d.startswith("eval_image_data")]
    assert img_dirs
    rgb0 = np.asarray(PILImage.open(
        tmp_path / "out" / img_dirs[0] / "rgb_0.jpg"), np.float32)
    assert rgb0.std() > 10.0  # random-noise source frames, not a constant
