"""Perceptual-quality gates that need NO pretrained VGG weights.

This environment has no ``vgg_conv.pth`` (and no network), so stylization
quality can never be demonstrated directly — all other loss tests are
semantics-parity only. These gates construct objectives whose OPTIMUM is
known without real weights and drive the FULL pipeline (scene bake → data
loading → render → VGG encode → loss → Adam on the hierarchical texture →
styled-frame render → metric):

1. Self-reproduction: content frames are renders of a known texture with
   ``shading=False`` (view-independent), the loss is content-only on
   shallow random-VGG layers — matching those features at every pixel is
   minimized by pixel reproduction, so the converged texture must re-render
   the photos (PSNR gate). Exercises the optimization end to end the way
   the reference's full runs do (model/optimize.py training loop).

2. Circle uniformity — the paper's Tab. 2 claim (reference
   scripts/eval/measure_circles.py:114-162 with
   styles/simple_shapes/circles_uniform_small.png), reproduced without
   pretrained weights: a texture whose circles are uniform in 3D (painted
   in texture space) must measure a NON-POSITIVE 3D-radius-vs-depth
   correlation after full optimization + styled render, while the only-2D
   baseline analogue (constant-PIXEL-radius circles composited per view,
   what a per-frame 2D stylization produces) must measure a strongly
   POSITIVE one. The 2D correlations mirror-image. Note the full arm's 3D
   correlation sits below zero rather than at it: true 3D radii are exactly
   constant, so the scale-free correlation amplifies the detector's ~1 px
   threshold-erosion bias (erosion in pixels × depth/f grows with depth);
   what the paper's claim forbids is the POSITIVE depth trend of 2D
   stylization, and the gate asserts exactly that separation.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from stylemesh_tpu.data.demo_scene import (
    build_demo_scene,
    circle_texture,
    demo_texture,
    paint_screen_circles,
)
from stylemesh_tpu.data.loading import SceneCache
from stylemesh_tpu.data.scenes import discover_scannet_scenes, select_scene
from stylemesh_tpu.eval.circles import measure_circles_for_scene
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.texture import sample_texture
from stylemesh_tpu.models.vgg import init_vgg_params
from stylemesh_tpu.ops.color import gatys_post
from stylemesh_tpu.optimize import render_styled_frames

# whole-file slow mark: 930s on this 1-core image (measured
# round 5, /tmp/test_times.log methodology); the default gate
# deselects via pytest.ini addopts -m "not slow".
pytestmark = pytest.mark.slow


def _scene_cache(root, texture, view_hw, heights, resize, frame_hook=None,
                 n_views=6):
    build_demo_scene(root, n_views=n_views, view_hw=view_hw,
                     pyramid_heights=heights, texture=texture, shading=False,
                     frame_hook=frame_hook, verbose=False)
    scenes = discover_scannet_scenes(os.path.join(root, "train", "images"),
                                     pyramid_levels=len(heights),
                                     min_pyramid_height=heights[0])
    spec = select_scene(scenes, min_images=1)
    return SceneCache(spec, resize_size=resize)


def _reconstruction_cfg(tex_size):
    # content-only on shallow layers of the random-init VGG: the loss is
    # exactly zero at pixel reproduction (any weights), and shallow layers
    # keep the reconstruction sharp enough to meter
    return PipelineConfig(
        texture_width=tex_size, texture_height=tex_size,
        hierarchical_layers=2,
        content_layers=("r11", "r21"), content_weights=(1.0, 1.0),
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=1.0, style_weight=0.0, tex_reg_weight=0.0,
        style_min_size=16, use_splat_kernel=False, learning_rate=1.0,
        decay_step_size=10 ** 6)


def _optimize(cache, cfg, steps):
    batch = cache.get_batch(cache.indices)
    vgg = init_vgg_params(rng=0)
    rng = np.random.default_rng(0)
    style = jnp.asarray(
        (rng.random((1, 48, 64, 3), dtype=np.float32) - 0.45) * 255.0)
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = pipe.prepare_batch(batch)
    for _ in range(steps):
        state, losses = pipe.train_step(state, batch, aux)
    jax.block_until_ready(losses)
    return state, batch


def _masked_psnr(state, batch):
    hw = batch.rgb.shape[1:3]
    uv = next((u for u in batch.uv if u.shape[1] == hw[0]), batch.uv[0])
    from stylemesh_tpu.ops.resize import resize_bilinear

    pred = resize_bilinear(
        gatys_post(sample_texture(state.texture, jnp.asarray(uv))), hw)
    rgb = gatys_post(jnp.asarray(batch.rgb))
    m = np.asarray(batch.mask)
    mse = (((np.asarray(pred) - np.asarray(rgb)) ** 2) * m).sum() / (
        m.sum() * 3)
    return -10 * np.log10(mse + 1e-12)


def test_self_reproduction_psnr_gate(tmp_path):
    """Content-only optimization must reproduce the ground-truth renders:
    rendered views converge from ~13 dB (gray init) to >24 dB PSNR."""
    cache = _scene_cache(str(tmp_path), demo_texture(size=512, seed=0),
                         view_hw=(120, 160), heights=(48, 96), resize=64)
    cfg = _reconstruction_cfg(128)
    batch = cache.get_batch(cache.indices)

    # init state: texture starts at the Gatys-space gray mean
    vgg = init_vgg_params(rng=0)
    style = jnp.zeros((1, 48, 64, 3), jnp.float32)
    init_psnr = _masked_psnr(TexturePipeline(cfg, vgg, style).init(), batch)
    assert init_psnr < 16.0, init_psnr

    state, batch = _optimize(cache, cfg, steps=75)
    final_psnr = _masked_psnr(state, batch)
    assert final_psnr > 24.0, final_psnr
    assert final_psnr > init_psnr + 9.0


def _circle_arm(root, arm):
    if arm == "full":
        tex = circle_texture(size=1024, radius_px=30, spacing_px=140)
        hook = None
    else:
        tex = np.full((64, 64, 3), 0.82, np.float32)

        def hook(i, img, depth):
            return paint_screen_circles(img, radius_px=14, spacing_px=64)

    cache = _scene_cache(root, tex, view_hw=(256, 341), heights=(64, 128),
                         resize=128, frame_hook=hook)
    state, _ = _optimize(cache, _reconstruction_cfg(256), steps=60)
    styled = os.path.join(root, "styled")
    render_styled_frames(state.texture, cache, styled, level=-1)
    return measure_circles_for_scene(cache, styled)


def test_circle_uniformity_full_vs_only2d(tmp_path):
    """Tab. 2 of the paper, with no pretrained weights: texture-space
    (3D-uniform) circles vs screen-space (2D-uniform) circles through the
    full optimize → render → circle-metric chain."""
    full = _circle_arm(str(tmp_path / "full"), "full")
    only2d = _circle_arm(str(tmp_path / "only2d"), "only2d")

    assert full["n_circles"] >= 40, full
    assert only2d["n_circles"] >= 60, only2d

    # 3D radii: no positive depth trend for the full method, strongly
    # positive for the only-2D baseline (measured -0.50 vs +0.63)
    assert full["corr_depth_3D"] < -0.1, full
    assert only2d["corr_depth_3D"] > 0.35, only2d
    assert only2d["corr_depth_3D"] - full["corr_depth_3D"] > 0.7

    # 2D radii mirror-image: shrink with depth when 3D-uniform, roughly
    # depth-independent when painted in screen space (measured -0.70, +0.19)
    assert full["corr_depth_2D"] < -0.4, full
    assert only2d["corr_depth_2D"] > -0.1, only2d
