"""End-to-end run_training coverage of the CLI-exposed sharding modes on the
8-device CPU mesh: --shard_atlas (atlas-banded pipeline) and repeated
--style_image_path (multi-style sweep). The plain and --data_parallel paths
are covered by test_pipeline.py / test_parallel.py."""

import dataclasses
import os

import jax
import numpy as np
import pytest
from PIL import Image

from stylemesh_tpu.data.loading import SceneCache
from stylemesh_tpu.data.scenes import discover_scannet_scenes, select_scene
from stylemesh_tpu.models.pipeline import PipelineConfig
from stylemesh_tpu.models.vgg import init_vgg_params
from stylemesh_tpu.optimize import RunConfig, run_training

from test_data import _make_scannet_scene

# whole-file slow mark: 583s on this 1-core image (measured
# round 5, /tmp/test_times.log methodology); the default gate
# deselects via pytest.ini addopts -m "not slow".
pytestmark = pytest.mark.slow

PIPE = PipelineConfig(
    texture_width=128, texture_height=128, hierarchical_layers=2,
    use_angle_weight=True, use_depth_scaling=True,
    content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
    style_pyramid_mode="multi", angle_threshold=30.0,
    style_min_size=16, learning_rate=0.5)


def _style_arr(seed):
    rng = np.random.default_rng(seed)
    return (rng.random((1, 48, 64, 3)).astype(np.float32) - 0.45) * 255.0


def _scene_cache(tmp_path, n_bands=1):
    _make_scannet_scene(tmp_path)
    scenes = discover_scannet_scenes(str(tmp_path), pyramid_levels=2,
                                     min_pyramid_height=16)
    spec = select_scene(scenes, min_images=1)
    cache = SceneCache(spec, resize_size=16)
    cache.attach_splat_plans([(128, 128), (64, 64)],
                             use_angle_weight=True, use_depth_scaling=True,
                             n_bands=n_bands)
    return cache


def _run_cfg(tmp_path, **kw):
    return RunConfig(
        root_path=str(tmp_path), max_epochs=1, views_per_batch=2,
        train_split=0.67, val_split=0.33, index_repeat=2,
        sampler_mode="repeat", save_texture=False, run_post_steps=False,
        log_dir=str(tmp_path / "runs"), **kw)


def test_shard_atlas_run_training(tmp_path):
    cache = _scene_cache(tmp_path, n_bands=len(jax.devices()))
    run = _run_cfg(tmp_path, shard_atlas=True)
    state, log_dir, _ = run_training(
        run, PIPE, scene_cache=cache,
        vgg_params=init_vgg_params(rng=3, scale=0.05),
        style_image=_style_arr(0))
    assert int(state.step) >= 1
    # banded plans actually attached (band axis = mesh size)
    assert cache._view_plans[0][0].g_ids.shape[0] == len(jax.devices())
    assert cache._view_plans[0][1] is None  # 64x64 not plan-eligible
    assert os.path.exists(os.path.join(log_dir, "texture.npz"))
    # wall-clock anatomy artifact: per-phase totals incl. train steps
    import json

    with open(os.path.join(log_dir, "wallclock.json")) as f:
        wall = json.load(f)
    for phase in ("pipeline_build", "compile_first_step", "validation",
                  "train_steps"):
        assert phase in wall and wall[phase]["total_s"] >= 0.0
    assert wall["train_steps"]["steps"] == int(state.step)


def test_multistyle_run_training(tmp_path):
    n_styles = len(jax.devices())
    style_dir = tmp_path / "styles"
    style_dir.mkdir()
    paths = []
    for s in range(1, n_styles):
        rng = np.random.default_rng(s)
        img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
        p = style_dir / f"style_{s}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))

    cache = _scene_cache(tmp_path)
    run = _run_cfg(tmp_path, extra_style_paths=tuple(paths))
    state, log_dir, _ = run_training(
        run, PIPE, scene_cache=cache,
        vgg_params=init_vgg_params(rng=3, scale=0.05),
        style_image=_style_arr(0))
    assert state.textures.layers[0].shape[0] == n_styles
    for s in range(n_styles):
        assert os.path.exists(os.path.join(log_dir, f"texture_style{s}.npz"))


def test_dynamic_level_skip_run_training(tmp_path, capsys):
    """run_training's per-batch level specialization: a view with an empty
    pyramid level gets a skip-specialized step; the run must produce exactly
    the losses and texture of the unspecialized run."""
    import json

    _make_scannet_scene(tmp_path)
    scenes = discover_scannet_scenes(str(tmp_path), pyramid_levels=2,
                                     min_pyramid_height=16)
    cache = SceneCache(select_scene(scenes, min_images=1), resize_size=16)
    # the fixture's depths never reach level 0 — plant level-0 pixels in
    # view 1 only, so the level is live scene-wide but empty per-batch for
    # view 0's chunks (views_per_batch=1). Mutate BEFORE plan attach so the
    # splat plans see the same depth levels as the pipeline.
    b = cache._batch_all
    rounded = np.array(b.rounded_depth_level)
    other = np.array(b.other_depth_level)
    assert not (rounded == 0).any() and not (other == 0).any()
    m = np.asarray(b.mask)[1, ..., 0] > 0
    ys, xs = np.nonzero(m)
    assert len(ys) >= 50
    rounded[1, ys[:50], xs[:50], 0] = 0
    other[1, ys[:50], xs[:50], 0] = 1
    cache._batch_all = b._replace(rounded_depth_level=rounded,
                                  other_depth_level=other)
    cache.attach_splat_plans([(128, 128), (64, 64)],
                             use_angle_weight=True, use_depth_scaling=True)

    vgg = init_vgg_params(rng=3, scale=0.05)
    results = {}
    for dyn in (True, False):
        run = dataclasses.replace(_run_cfg(tmp_path), views_per_batch=1,
                                  dynamic_level_skip=dyn)
        state, log_dir, _ = run_training(run, PIPE, scene_cache=cache,
                                         vgg_params=vgg,
                                         style_image=_style_arr(0))
        with open(os.path.join(log_dir, "metrics.jsonl")) as f:
            losses = [json.loads(l) for l in f
                      if '"Batch/Loss/train/' in l]
        results[dyn] = (state, losses)
    out = capsys.readouterr().out
    assert "specializing step" in out

    (s_dyn, l_dyn), (s_off, l_off) = results[True], results[False]
    assert len(l_dyn) == len(l_off) > 0
    for a, b2 in zip(l_dyn, l_off):
        assert a["tag"] == b2["tag"] and a["step"] == b2["step"]
        np.testing.assert_allclose(a["value"], b2["value"], rtol=1e-5,
                                   err_msg=a["tag"])
    # the specialized step is a different XLA program computing the same
    # math; f32 reassociation differences pass through Adam's normalization,
    # so the end-to-end texture gate is loose-tolerance (losses above are
    # the sharp per-step gate)
    for x, y in zip(s_dyn.texture.layers, s_off.texture.layers):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-4)


def test_exclusive_mode_flags(tmp_path):
    cache = _scene_cache(tmp_path)
    run = _run_cfg(tmp_path, shard_atlas=True, data_parallel=True)
    with pytest.raises(ValueError, match="exclusive"):
        run_training(run, PIPE, scene_cache=cache,
                     vgg_params=init_vgg_params(rng=3, scale=0.05),
                     style_image=_style_arr(0))
