"""Pipeline tests: depth-level golden values, full gradient parity vs the
torch oracle (hooks + masked losses), and end-to-end loss decrease."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from stylemesh_tpu.data.depth_level import calculate_depth_level
from stylemesh_tpu.data.synthetic import synthetic_view_batch
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.texture import Texture
from stylemesh_tpu.models.vgg import init_vgg_params
from tests.torch_reference import RefLoss, ref_pipeline_grads, torch_params_from_jax
import pytest

# whole-file slow mark: 336s on this 1-core image (measured
# round 5, /tmp/test_times.log methodology); the default gate
# deselects via pytest.ini addopts -m "not slow".
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(11)


# ------------------------------------------------------------- depth level


def _ref_depth_level(depth, levels, min_depth, min_uv_height=32):
    """Literal reference math (scannet_dataset.py:330-366)."""
    levels = np.asarray(levels, dtype=np.float64)
    n = len(levels)
    df = depth.squeeze() / min_depth
    uvh = min_uv_height * df
    x = np.subtract.outer(uvh, levels)
    rounded = np.argmin(abs(x), axis=-1)
    residues = levels[rounded] - uvh
    disc = np.where(residues > 0, -1, 1)
    disc[residues == 0] = 0
    other = rounded + disc
    other[other < 0] = 0
    other[other >= n] = n - 1
    hd = abs(levels[rounded] - levels[other])
    lr = abs(residues / (hd + 1e-6))
    lr[hd == 0] = 0
    lr = 1 - lr
    cont = np.where(residues > 0, other + lr, other - lr)
    cont[lr == 1] = rounded[lr == 1]
    return cont.astype(np.float32), rounded, other, lr.astype(np.float32)


def test_depth_level_matches_reference():
    depth = (RNG.random((24, 30)) * 6.0 + 0.05).astype(np.float32)
    levels = [256.0, 432.0, 608.0, 784.0, 960.0]
    ours = calculate_depth_level(depth, levels, min_depth=0.25)
    ref = _ref_depth_level(depth, levels, 0.25)
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-4)
    np.testing.assert_array_equal(ours[1], ref[1])
    np.testing.assert_array_equal(ours[2], ref[2])
    np.testing.assert_allclose(ours[3], ref[3], atol=1e-5)


# ------------------------------------------------------------- grad parity


def test_full_gradient_parity_vs_torch_hooks():
    """Texture gradients of the jitted loss must match the reference's
    hook-based backward for the full angle+depth configuration."""
    batch = synthetic_view_batch(num_views=1, content_hw=(48, 64),
                                 level_heights=(48, 72, 96), seed=3)
    vgg = init_vgg_params(rng=9, scale=0.08)

    cfg = PipelineConfig(
        texture_width=64, texture_height=64, hierarchical_layers=2,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=0.0,
        angle_threshold=45.0, style_pyramid_mode="multi",
        style_min_size=32,  # keep the style pyramid distinct at test sizes
        learning_rate=1.0)
    style = (RNG.random((1, 96, 128, 3)).astype(np.float32) - 0.45) * 255.0
    pipe = TexturePipeline(cfg, vgg, jnp.asarray(style))

    tex_np = [RNG.normal(0, 20, size=(64 // 2 ** i, 64 // 2 ** i, 3)).astype(np.float32)
              for i in range(2)]
    texture = Texture.from_arrays(tex_np)

    (total, (losses, _)), grads = jax.value_and_grad(
        pipe.loss_fn, has_aux=True)(texture, batch, None)

    # --- torch oracle
    ref_loss = RefLoss(torch_params_from_jax(vgg),
                       cfg.style_layers, cfg.content_layers,
                       cfg.style_weights, cfg.content_weights,
                       angle_threshold=45.0, style_pyramid_mode="multi")
    ref_loss.set_style_image(
        torch.from_numpy(np.moveaxis(style, -1, 1).copy()), minimum_size=32)

    def chw(x):
        return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())

    uv_grids = [torch.from_numpy(np.asarray(u).copy()) for u in batch.uv]
    rtotal, rcontent, rstyle, rgrads = ref_pipeline_grads(
        [torch.from_numpy(np.moveaxis(t, -1, 0).copy()) for t in tex_np],
        uv_grids, chw(batch.rgb), chw(batch.mask), chw(batch.angle_guidance),
        chw(batch.angle_degrees), chw(batch.rounded_depth_level),
        chw(batch.other_depth_level), chw(batch.depth_level_weight),
        ref_loss, content_weight=7e1, style_weight=1e-4)

    np.testing.assert_allclose(float(total), rtotal, rtol=5e-3)
    for ours, theirs in zip(grads.layers, rgrads):
        theirs = np.moveaxis(theirs.squeeze(0) if theirs.ndim == 4 else theirs, 0, -1)
        scale = max(np.abs(theirs).max(), 1e-8)
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-2 * scale)


# ------------------------------------------------------------- end to end


def test_static_level_skip_matches_full():
    """A pyramid level empty in every view contributes exactly nothing, so
    statically skipping it (skip_levels) must reproduce the full pipeline's
    losses and texture trajectory bit-for-bit-close — including the
    gram-average cache walk (an empty level never pushes)."""
    batch = synthetic_view_batch(num_views=2, content_hw=(48, 64),
                                 level_heights=(48, 72, 96), seed=7)
    batch = batch._replace(
        rounded_depth_level=np.maximum(batch.rounded_depth_level, 1),
        other_depth_level=np.maximum(batch.other_depth_level, 1))
    vgg = init_vgg_params(rng=4, scale=0.08)
    base = dict(
        texture_width=128, texture_height=128, hierarchical_layers=2,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        learning_rate=0.5, decay_step_size=100, style_min_size=32,
        style_pyramid_mode="multi", gram_mode="average")
    style = jnp.asarray(
        (RNG.random((1, 96, 128, 3)).astype(np.float32) - 0.45) * 255.0)
    p_full = TexturePipeline(PipelineConfig(**base), vgg, style)
    p_skip = TexturePipeline(PipelineConfig(**base, skip_levels=(0,)), vgg,
                             style)
    s_full = p_full.init()
    s_skip = p_skip.init()
    for _ in range(3):
        s_full, l_full = p_full.train_step(s_full, batch)
        s_skip, l_skip = p_skip.train_step(s_skip, batch)
        for k in l_full:
            np.testing.assert_allclose(float(l_full[k]), float(l_skip[k]),
                                       rtol=1e-6, err_msg=k)
    for a, b in zip(s_full.texture.layers, s_skip.texture.layers):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_stop_grad_levels_matches_full():
    """A level whose gradient reweighting is an exact zero at every pixel
    (here: depth_level_weight == 0 kills the rounded term and nothing has
    other == 0) still contributes its loss VALUE, but its texture gradient
    is exactly zero — so stop_grad_levels must reproduce the full pipeline's
    losses and texture trajectory while deleting the level's backward."""
    batch = synthetic_view_batch(num_views=2, content_hw=(48, 64),
                                 level_heights=(48, 72, 96), seed=9,
                                 jnp_arrays=False)
    V, H, W = batch.mask.shape[:3]
    rounded = np.zeros((V, H, W, 1), np.int32)
    rounded[:, H // 2:] = 1
    other = rounded + 1
    batch = batch._replace(
        rounded_depth_level=rounded, other_depth_level=other,
        depth_level_weight=np.zeros((V, H, W, 1), np.float32))

    # the host analysis must prove level 0 gradient-dead, levels 1/2 alive
    from stylemesh_tpu.data.grad_masks import grad_weight_masks
    level_shapes = [tuple(u.shape[1:3]) for u in batch.uv]
    masks = grad_weight_masks(batch, level_shapes, True, True)
    assert not masks[0].any()
    assert masks[1].any() and masks[2].any()

    vgg = init_vgg_params(rng=6, scale=0.08)
    base = dict(
        texture_width=128, texture_height=128, hierarchical_layers=2,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        learning_rate=0.5, decay_step_size=100, style_min_size=32,
        style_pyramid_mode="multi", gram_mode="average")
    style = jnp.asarray(
        (RNG.random((1, 96, 128, 3)).astype(np.float32) - 0.45) * 255.0)
    p_full = TexturePipeline(PipelineConfig(**base), vgg, style)
    p_sg = TexturePipeline(PipelineConfig(**base, stop_grad_levels=(0,)),
                           vgg, style)
    s_full = p_full.init()
    s_sg = p_sg.init()
    for _ in range(3):
        s_full, l_full = p_full.train_step(s_full, batch)
        s_sg, l_sg = p_sg.train_step(s_sg, batch)
        for k in l_full:
            np.testing.assert_allclose(float(l_full[k]), float(l_sg[k]),
                                       rtol=1e-6, err_msg=k)
        # the dead level's loss value must actually be nonzero for the test
        # to mean anything (value kept, not skipped)
        assert float(l_full["style"]) > 0
    for a, b in zip(s_full.texture.layers, s_sg.texture.layers):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_specialized_pipelines_share_one_state():
    """Dynamic level skip (optimize.run_training) alternates differently-
    specialized sibling pipelines over ONE TrainState: a batch with an empty
    level runs a skip-specialized step, the next (all-live) batch runs the
    base step. The interleaved trajectory — shared texture, Adam moments,
    gram-average cache, donated buffers — must match the base pipeline
    running every batch un-specialized."""
    batch_live = synthetic_view_batch(num_views=2, content_hw=(48, 64),
                                      level_heights=(48, 72, 96), seed=12)
    batch_empty0 = synthetic_view_batch(num_views=2, content_hw=(48, 64),
                                        level_heights=(48, 72, 96), seed=13)
    batch_empty0 = batch_empty0._replace(
        rounded_depth_level=np.maximum(batch_empty0.rounded_depth_level, 1),
        other_depth_level=np.maximum(batch_empty0.other_depth_level, 1))
    vgg = init_vgg_params(rng=5, scale=0.08)
    base = dict(
        texture_width=128, texture_height=128, hierarchical_layers=2,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        learning_rate=0.5, decay_step_size=100, style_min_size=32,
        style_pyramid_mode="multi", gram_mode="average")
    style = jnp.asarray(
        (RNG.random((1, 96, 128, 3)).astype(np.float32) - 0.45) * 255.0)
    p_base = TexturePipeline(PipelineConfig(**base), vgg, style)
    # the specialized sibling shares the base pipeline's style targets,
    # exactly as run_training builds it
    p_skip = TexturePipeline(PipelineConfig(**base, skip_levels=(0,)), vgg,
                             style, style_targets=p_base.style_targets)
    schedule = [(batch_empty0, p_skip), (batch_live, p_base),
                (batch_empty0, p_skip), (batch_live, p_base)]
    s_ref = p_base.init()
    s_mix = p_base.init()
    for b, spec_pipe in schedule:
        s_ref, l_ref = p_base.train_step(s_ref, b)
        s_mix, l_mix = spec_pipe.train_step(s_mix, b)
        for k in l_ref:
            np.testing.assert_allclose(float(l_ref[k]), float(l_mix[k]),
                                       rtol=1e-6, err_msg=k)
    for a, b in zip(s_ref.texture.layers, s_mix.texture.layers):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_view_level_tables():
    """The per-view liveness tables drive both the scene-wide static skip
    and the per-batch specialization signatures."""
    import types

    from stylemesh_tpu.optimize import view_level_tables

    batch = synthetic_view_batch(num_views=3, content_hw=(48, 64),
                                 level_heights=(48, 72, 96), seed=14,
                                 jnp_arrays=False)
    rounded = np.array(batch.rounded_depth_level)
    other = np.array(batch.other_depth_level)
    # view 0: only level 1 (and 2 via other); view 1/2: untouched
    rounded[0] = 1
    other[0] = 2
    batch = batch._replace(rounded_depth_level=rounded, other_depth_level=other)
    cache = types.SimpleNamespace(_batch_all=batch)
    cfg = PipelineConfig(texture_width=64, texture_height=64,
                         use_angle_weight=True, use_depth_scaling=True)
    loss_live, grad_live = view_level_tables(cache, cfg)
    assert loss_live.shape == (3, 3) and grad_live.shape == (3, 3)
    assert not loss_live[0, 0] and loss_live[0, 1] and loss_live[0, 2]
    # grad-liveness is a subset of loss-liveness (dead loss => dead grad)
    assert not (grad_live & ~loss_live).any()
    # without any reweighting there is no grad table
    cfg_off = PipelineConfig(texture_width=64, texture_height=64,
                             use_angle_weight=False, use_depth_scaling=False)
    live2, grad2 = view_level_tables(cache, cfg_off)
    assert grad2 is None
    assert live2[:, :-1].sum() == 0 and live2[:, -1].all()


def test_train_step_decreases_loss():
    batch = synthetic_view_batch(num_views=2, content_hw=(48, 64),
                                 level_heights=(48, 72, 96), seed=5)
    vgg = init_vgg_params(rng=4, scale=0.08)
    cfg = PipelineConfig(
        texture_width=128, texture_height=128, hierarchical_layers=2,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        learning_rate=0.5, decay_step_size=100, style_min_size=32,
        style_pyramid_mode="single")
    style = (RNG.random((1, 96, 128, 3)).astype(np.float32) - 0.45) * 255.0
    pipe = TexturePipeline(cfg, vgg, jnp.asarray(style))
    state = pipe.init()
    first = None
    last = None
    for i in range(6):
        state, losses = pipe.train_step(state, batch)
        t = float(losses["total"])
        if first is None:
            first = t
        last = t
    assert last < first, (first, last)
    assert int(state.step) == 6
