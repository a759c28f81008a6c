"""Data-layer tests against synthetic on-disk scenes in the exact reference
layouts (ScanNet scene dirs / Matterport rendered regions)."""

import numpy as np
import pytest
from PIL import Image

from stylemesh_tpu.data.loading import SceneCache, load_view, views_to_batch
from stylemesh_tpu.data.sampling import batched, epoch_indices, make_split
from stylemesh_tpu.data.scenes import (
    discover_matterport_regions,
    discover_scannet_scenes,
    select_scene,
)

N_FRAMES = 3
CONTENT_HW = (24, 32)  # (h, w) of color/depth
UV_HEIGHTS = (16, 24)
ASPECT = 32 / 24


def _write_uv_npy(path, h, w, seed):
    rng = np.random.default_rng(seed)
    uv = rng.random((h, w, 3), dtype=np.float32)
    uv[:2, :2] = 0.0  # some invalid texels
    np.save(path, uv)


def _make_scannet_scene(root, name="scene0000_00"):
    sp = root / name
    for sub in ["color", "depth", "pose", "uv"] + [f"uv_{h}" for h in UV_HEIGHTS]:
        (sp / sub).mkdir(parents=True)
    h, w = CONTENT_HW
    rng = np.random.default_rng(0)
    for i in range(N_FRAMES):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            sp / "color" / f"{i}.jpg")
        depth = rng.integers(500, 5000, (h, w), dtype=np.uint16)
        Image.fromarray(depth.astype(np.int32), mode="I").save(sp / "depth" / f"{i}.png")
        pose = np.eye(4) + rng.normal(0, 0.01, (4, 4))
        with open(sp / "pose" / f"{i}.txt", "w") as f:
            for row in pose:
                f.write(" ".join(str(v) for v in row) + "\n")
        angle = rng.random((h * 2, w * 2, 3), dtype=np.float32)
        np.save(sp / "uv" / f"{i}.angle.npy", angle)
        np.save(sp / "uv" / f"{i}.rendered_depth.npy",
                rng.random((h * 2, w * 2, 3), dtype=np.float32))
        for lh in UV_HEIGHTS:
            _write_uv_npy(sp / f"uv_{lh}" / f"{i}.npy", lh, int(lh * ASPECT), i * 10 + lh)
    with open(sp / f"{name}.txt", "w") as f:
        f.write("fx_color = 30.0\nfy_color = 31.0\nmx_color = 16.0\nmy_color = 12.0\n")
        f.write(f"colorWidth = {w}\ncolorHeight = {h}\n")
    return sp


def _make_matterport_region(root, scan="17DRP5sb8fy", region=0):
    rp = root / scan / "rendered" / f"region_{region}"
    for sub in ["color", "depth", "pose", "angle", "rendered_depth"] + \
               [f"uv_-1_{h}" for h in UV_HEIGHTS]:
        (rp / sub).mkdir(parents=True)
    h, w = CONTENT_HW
    rng = np.random.default_rng(1)
    names = [f"pano{p}_i{c}_{y}" for p, c, y in
             [("aa", 0, 0), ("aa", 0, 1), ("bb", 1, 0)]]
    for i, nm in enumerate(names):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
            rp / "color" / f"{nm}.jpg")
        depth = rng.integers(1000, 20000, (h, w), dtype=np.uint16)
        Image.fromarray(depth.astype(np.int32), mode="I").save(rp / "depth" / f"{nm}.png")
        pose = np.eye(4) + rng.normal(0, 0.01, (4, 4))
        with open(rp / "pose" / f"{nm}.txt", "w") as f:
            for row in pose:
                f.write(" ".join(str(v) for v in row) + "\n")
        np.save(rp / "angle" / f"{nm}.angle.npy",
                rng.random((h * 2, w * 2, 3), dtype=np.float32))
        np.save(rp / "rendered_depth" / f"{nm}.rendered_depth.npy",
                rng.random((h * 2, w * 2, 3), dtype=np.float32))
        for lh in UV_HEIGHTS:
            _write_uv_npy(rp / f"uv_-1_{lh}" / f"{nm}.uvs.npy",
                          lh, int(lh * ASPECT), i * 10 + lh)
    with open(rp / "pose" / f"{names[0]}.intrinsics.txt", "w") as f:
        f.write("30.0 0.0 16.0\n0.0 31.0 12.0\n0.0 0.0 1.0\n")
        f.write(f"{w} {h}\n")
    return rp


def test_scannet_discovery_and_loading(tmp_path):
    _make_scannet_scene(tmp_path)
    scenes = discover_scannet_scenes(str(tmp_path), pyramid_levels=5,
                                     min_pyramid_height=16)
    assert "scene0000_00" in scenes
    spec = scenes["scene0000_00"]
    assert spec.num_frames == N_FRAMES
    assert list(spec.levels) == [16.0, 24.0]
    assert not spec.rendered_depth

    view = load_view(spec, 1, resize_size=16)
    assert view.rgb.shape == (16, 21, 3)  # round(32*16/24)=21
    assert view.uv[0].shape == (16, 21, 2)
    assert view.uv[1].shape == (24, 32, 2)
    assert view.mask.shape == (16, 21, 1)
    assert view.uv[0].min() >= -1.0 and view.uv[0].max() <= 1.0
    assert view.angle_degrees.min() >= 0.0
    # intrinsics rescaled: fx 30 * 21/32
    np.testing.assert_allclose(view.intrinsics[0, 0], 30.0 * 21 / 32, rtol=1e-5)
    # depth level indices valid
    assert view.rounded_depth_level.min() >= 0
    assert view.rounded_depth_level.max() <= 1


def test_min_height_filter_and_level_cap(tmp_path):
    _make_scannet_scene(tmp_path)
    scenes = discover_scannet_scenes(str(tmp_path), pyramid_levels=1,
                                     min_pyramid_height=20)
    spec = scenes["scene0000_00"]
    assert list(spec.levels) == [24.0]
    assert len(spec.uv) == 1


def test_matterport_discovery_and_loading(tmp_path):
    _make_matterport_region(tmp_path)
    scenes = discover_matterport_regions(str(tmp_path), region_index=0,
                                         min_pyramid_height=16)
    assert "17DRP5sb8fy" in scenes
    spec = scenes["17DRP5sb8fy"]
    assert spec.num_frames == 3
    assert spec.depth_divisor == 4000.0
    assert not spec.mask_uses_depth
    view = load_view(spec, 0, resize_size=16)
    assert view.rgb.shape == (16, 21, 3)
    assert np.isfinite(view.depth).all()


def test_scene_cache_and_batching(tmp_path):
    _make_scannet_scene(tmp_path)
    scenes = discover_scannet_scenes(str(tmp_path), min_pyramid_height=16)
    spec = select_scene(scenes, name="scene0000_00", min_images=1, max_images=-1)
    cache = SceneCache(spec, resize_size=16)
    batch = cache.get_batch([0, 2])
    assert batch.rgb.shape[0] == 2
    assert batch.num_levels == 2
    assert list(batch.idx) == [0, 2]

    train, val = make_split(N_FRAMES, split=(0.67, 0.33), split_mode="sequential")
    assert train == [0, 1] and val == [2]
    stream = epoch_indices(train, sampler_mode="repeat", index_repeat=3)
    assert stream == [0, 0, 0, 1, 1, 1]
    batches = batched(stream, 4)
    assert [len(b) for b in batches] == [4, 4]  # padded trailing batch
    assert batches[1] == [1, 1, 1, 1]


def test_plan_disk_cache_roundtrip(tmp_path, monkeypatch):
    """attach_splat_plans caches to disk: a second cache with identical
    inputs loads bit-identical plans instead of re-planning."""
    import dataclasses

    import numpy as np

    monkeypatch.setenv("STYLEMESH_PLAN_CACHE_DIR", str(tmp_path / "plans"))
    _make_scannet_scene(tmp_path)
    scenes = discover_scannet_scenes(str(tmp_path), min_pyramid_height=16)
    spec = select_scene(scenes, name="scene0000_00", min_images=1,
                        max_images=-1)
    layer_sizes = [(64, 128), (32, 64)]
    a = SceneCache(spec, resize_size=16)
    a.attach_splat_plans(layer_sizes, use_angle_weight=True,
                         use_depth_scaling=True)
    assert len(list((tmp_path / "plans").iterdir())) == 1
    # the second attach MUST come from the cache: re-planning (a silently
    # dead _load_plan_cache) would call the planner again and trip this
    import stylemesh_tpu.ops.splat_plan as sp

    def _boom(*a, **k):
        raise AssertionError("cache miss: planner re-ran on identical inputs")

    b = SceneCache(spec, resize_size=16)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(sp, "plan_arrays_for_views", _boom)
        b.attach_splat_plans(layer_sizes, use_angle_weight=True,
                             use_depth_scaling=True)

    def assert_same(plans_a, plans_b):
        for la, lb in zip(plans_a, plans_b):
            for pa, pb in zip(la, lb):
                assert (pa is None) == (pb is None)
                if pa is None:
                    continue
                for f in dataclasses.fields(pa):
                    va, vb = getattr(pa, f.name), getattr(pb, f.name)
                    if isinstance(va, np.ndarray):
                        assert np.array_equal(va, vb), f.name
                    else:
                        assert va == vb, f.name

    assert_same(a._view_plans, b._view_plans)
    # different planner inputs miss the cache (new entry, not a stale hit)
    c = SceneCache(spec, resize_size=16)
    c.attach_splat_plans(layer_sizes, use_angle_weight=False,
                         use_depth_scaling=False)
    assert len(list((tmp_path / "plans").iterdir())) == 2
    # atlas-banded plans (leading band axis, band-local residuals) roundtrip
    d1 = SceneCache(spec, resize_size=16)
    d1.attach_splat_plans(layer_sizes, n_bands=2)
    d2 = SceneCache(spec, resize_size=16)
    d2.attach_splat_plans(layer_sizes, n_bands=2)
    assert len(list((tmp_path / "plans").iterdir())) == 3
    assert d1._view_plans[0][0].tex_h_global == 64  # really banded
    assert_same(d1._view_plans, d2._view_plans)


def test_select_scene_range(tmp_path):
    _make_scannet_scene(tmp_path)
    scenes = discover_scannet_scenes(str(tmp_path), min_pyramid_height=16)
    spec = select_scene(scenes, name=None, min_images=1, max_images=10, seed=0)
    assert spec.name == "scene0000_00"
    with pytest.raises(ValueError):
        select_scene(scenes, name=None, min_images=100, max_images=-1)
