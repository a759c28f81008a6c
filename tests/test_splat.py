"""Pallas splat/gather kernel correctness vs the reference XLA scatter-add /
gather (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.ops.grid_sample import (
    _grid_sample_fwd_impl,
    _scatter_add_grad,
    grid_sample_planned,
)
from stylemesh_tpu.ops.splat_pallas import (
    gather_with_residual,
    splat_with_residual,
)
from stylemesh_tpu.ops.splat_plan import plan_arrays_for_views
import pytest

# whole-file slow mark: 115s on this 1-core image (measured
# round 5, /tmp/test_times.log methodology); the default gate
# deselects via pytest.ini addopts -m "not slow".
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(71)


def _smooth_uv(v, h, w, span=0.6, offset=0.15):
    """Smooth per-view uv grids covering a sub-window of the atlas."""
    grids = []
    for i in range(v):
        ys, xs = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                             indexing="ij")
        u = offset + span * xs + 0.02 * i
        vv = offset + span * ys
        grids.append(np.stack([u * 2 - 1, vv * 2 - 1], -1))
    return np.asarray(grids, np.float32)


def _seamed_uv(v, h, w):
    """uv with an island seam: right half jumps across the atlas."""
    uv = _smooth_uv(v, h, w, span=0.25, offset=0.1)
    uv[:, :, w // 2 - 20:, 0] += 1.2  # jump in x
    return np.clip(uv, -1, 1)


def _reference_grad(g, uv, tex_h, tex_w):
    total = jnp.zeros((tex_h, tex_w, 3), jnp.float32)
    for i in range(g.shape[0]):
        total = total + _scatter_add_grad(jnp.asarray(g[i]), jnp.asarray(uv[i]),
                                          tex_h, tex_w)
    return np.asarray(total)


def _run(uv, tex_h, tex_w, weight_masks=None, g=None, **plan_kw):
    v, h, w = uv.shape[:3]
    if g is None:
        g = RNG.normal(0, 1, size=(v, h, w, 3)).astype(np.float32)
    plan = plan_arrays_for_views(uv, tex_h, tex_w, weight_masks=weight_masks,
                                 **plan_kw)
    out = splat_with_residual(jnp.asarray(g), jnp.asarray(uv), plan,
                              tex_h, tex_w, interpret=True)
    out = np.asarray(out).transpose(1, 2, 0)
    ref = _reference_grad(g, uv, tex_h, tex_w)
    return out, ref, plan


def test_splat_smooth_uv_no_residual():
    uv = _smooth_uv(2, 24, 70, span=0.18)
    out, ref, plan = _run(uv, 128, 256)
    assert plan.res_weight.sum() == 0  # footprints fit the window
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_auto_region_sizing():
    """The planner picks a per-pair window from the footprints: a tight uv
    span on a big atlas must not get the full legacy 128x512 window."""
    uv = _smooth_uv(2, 32, 128, span=0.05)
    out, ref, plan = _run(uv, 1024, 1024)
    assert plan.region_h * plan.region_w <= 64 * 384, (plan.region_h,
                                                       plan.region_w)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_with_island_seam_split_entries():
    """A seam tile is split into per-island entries (disjoint pixel labels),
    not residuals: every corner rides the fast factorized path."""
    uv = _seamed_uv(1, 20, 128)
    out, ref, plan = _run(uv, 128, 256, region_h=32, region_w=128)
    assert (plan.labels > 0).any()  # some pixels carry a non-zero island id
    assert plan.g_acc.sum() > 0  # split tiles accumulate over entries
    assert plan.res_weight.sum() == 0  # two islands never need residuals
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_three_island_entries():
    """Three uv clusters in one tile become three entries of the same tile
    (the gather accumulates them into one out block)."""
    uv = _smooth_uv(1, 16, 64, span=0.05, offset=0.05)
    uv[:, :, 20:40, 1] += 0.5
    uv[:, :, 40:, 1] += 1.2
    uv = np.clip(uv, -1, 1).astype(np.float32)
    out, ref, plan = _run(uv, 1024, 128, region_h=32, region_w=128)
    assert plan.labels.max() >= 2
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_small_window_partition_no_residuals():
    """Seam tiles partition cleanly at windows far below the old (8, 128)
    bucket floors: no pixel falls to the residual scatter just because one
    bucket cell was wider than the window (the failure that made small
    candidate windows explode residuals on seam-heavy scenes)."""
    uv = _seamed_uv(2, 24, 128)
    out, ref, plan = _run(uv, 128, 512, region_h=32, region_w=64)
    assert plan.labels.max() >= 1  # tiles did get partitioned
    assert plan.res_weight.sum() == 0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_many_island_residual_overflow():
    """More islands than MAX_TILE_ENTRIES in one tile: the overflow pixels
    (label -1) fall back to the residual scatter and still match."""
    from stylemesh_tpu.ops.splat_plan import MAX_TILE_ENTRIES

    uv = _smooth_uv(1, 16, 64, span=0.02, offset=0.02)
    for k in range(1, 9):  # 9 scattered clusters along y
        uv[:, :, 7 * k:7 * (k + 1), 1] += 0.105 * k
    uv = np.clip(uv, -1, 1).astype(np.float32)
    out, ref, plan = _run(uv, 2048, 128, region_h=16, region_w=128)
    assert plan.labels.max() == MAX_TILE_ENTRIES - 1
    assert (plan.labels == -1).any()
    assert plan.res_weight.sum() > 0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_border_clamp():
    """uv beyond [-1,1] clamps to the border (duplicate-corner adds)."""
    uv = _smooth_uv(1, 16, 64, span=1.4, offset=-0.2).astype(np.float32)
    out, ref, plan = _run(uv, 64, 128)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_padded_pixels_ignored():
    # h, w deliberately not multiples of the tile size
    uv = _smooth_uv(1, 19, 45, span=0.2)
    out, ref, _ = _run(uv, 128, 256)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_dead_tiles_skipped():
    """Tiles whose gradient weight is all-zero are dropped from the splat
    schedule; the result must still match the reference computed on the
    weighted gradient."""
    uv = _smooth_uv(2, 32, 128, span=0.3)
    v, h, w = uv.shape[:3]
    weight = np.zeros((v, h, w), bool)
    weight[:, : h // 2] = True  # bottom half provably dead
    g = RNG.normal(0, 1, size=(v, h, w, 3)).astype(np.float32)
    g_weighted = g * weight[..., None]  # what autodiff hands the splat
    out, ref, plan = _run(uv, 128, 256, weight_masks=weight, g=g_weighted)
    plan_full = plan_arrays_for_views(uv, 128, 256)
    assert plan.s_alive.sum() < plan_full.s_alive.sum()  # tiles were dropped
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_window_grouping_flags():
    """Window runs: loads only at run starts, stores only at run ends, and
    every live tile belongs to exactly one loaded+stored run. (With v4's
    true-origin effective windows, tiles share a run only when the coarse
    anchor grid still covers their joint footprint — tiny windows may give
    one run per tile, which the double-buffered DMA absorbs.)"""
    uv = _smooth_uv(1, 64, 128, span=0.05)
    _, _, plan = _run(uv, 1024, 1024)
    alive = plan.s_alive[0].astype(bool)
    assert plan.s_load[0].sum() == plan.s_store[0].sum()
    assert plan.s_load[0].sum() <= alive.sum()
    # runs pair up: between a load and its store the window never changes
    oy, ox = plan.s_oy[0], plan.s_ox[0]
    open_run = False
    for i in range(len(alive)):
        if not alive[i]:
            continue
        if plan.s_load[0][i]:
            open_run = True
            run_win = (oy[i], ox[i])
        assert open_run and (oy[i], ox[i]) == run_win
        if plan.s_store[0][i]:
            open_run = False
    assert not open_run


def test_pipeline_gradients_with_plans_match():
    """Train-step gradients via the planned (Pallas-interpret) backward must
    equal the XLA scatter backward."""
    import jax

    from stylemesh_tpu.data.synthetic import synthetic_view_batch, with_splat_plans
    from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
    from stylemesh_tpu.models.vgg import init_vgg_params

    cfg = PipelineConfig(
        texture_width=128, texture_height=128, hierarchical_layers=1,
        content_weight=7e1, style_weight=1e-4, style_min_size=32,
        use_angle_weight=True, use_depth_scaling=True)
    vgg = init_vgg_params(rng=2, scale=0.08)
    style = jnp.asarray((RNG.random((1, 96, 128, 3)).astype(np.float32) - 0.45) * 255)
    batch = synthetic_view_batch(num_views=2, content_hw=(32, 42),
                                 level_heights=(32, 48), seed=4)
    pipe = TexturePipeline(cfg, vgg, style)
    tex = pipe.init().texture

    grads_plain = jax.grad(lambda t: pipe.loss_fn(t, batch, None)[0])(tex)
    batch_p = with_splat_plans(batch, [(128, 128)], use_angle_weight=True,
                               use_depth_scaling=True)
    grads_plan = jax.grad(lambda t: pipe.loss_fn(t, batch_p, None)[0])(tex)
    for a, b in zip(grads_plain.layers, grads_plan.layers):
        b = np.asarray(b)
        # MXU vs scatter accumulation order: ~1e-4 relative on f32
        np.testing.assert_allclose(np.asarray(a), b,
                                   atol=5e-4 * max(np.abs(b).max(), 1.0))


def test_planned_forward_matches_xla_gather():
    tex = RNG.normal(0, 1, (128, 256, 3)).astype(np.float32)
    for name, uv in [("smooth", _smooth_uv(2, 24, 70, span=0.18)),
                     ("clamped", _smooth_uv(1, 16, 64, span=1.4, offset=-0.2)),
                     ("seamed", _seamed_uv(1, 20, 128))]:
        plan = plan_arrays_for_views(uv, 128, 256)
        out = grid_sample_planned(jnp.asarray(tex), jnp.asarray(uv), plan)
        ref = _grid_sample_fwd_impl(jnp.asarray(tex), jnp.asarray(uv))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=name)


def test_planned_forward_residual_path():
    """More islands than MAX_TILE_ENTRIES in a tile overflows to the
    residual scatter and exercises the forward residual overlay."""
    tex = RNG.normal(0, 1, (2048, 128, 3)).astype(np.float32)
    uv = _smooth_uv(1, 16, 64, span=0.02, offset=0.02)
    for k in range(1, 9):
        uv[:, :, 7 * k:7 * (k + 1), 1] += 0.105 * k
    uv = np.clip(uv, -1, 1).astype(np.float32)
    plan = plan_arrays_for_views(uv, 2048, 128, region_h=16, region_w=128)
    assert plan.res_weight.sum() > 0
    out = grid_sample_planned(jnp.asarray(tex), jnp.asarray(uv), plan)
    ref = _grid_sample_fwd_impl(jnp.asarray(tex), jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_splat_background_pixels_analytic():
    """Pixels at grid exactly (-1,-1) (baked-uv background) must hit texel
    (0,0) with weight 1 via the analytic path — both directions. Dead
    (background-only) tiles are skipped in the gather."""
    uv = _smooth_uv(1, 24, 70, span=0.15, offset=0.4)
    uv[:, :6, :, :] = -1.0  # background strip
    uv = uv.astype(np.float32)
    out, ref, plan = _run(uv, 128, 256)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    tex = RNG.normal(0, 1, (128, 256, 3)).astype(np.float32)
    fwd = gather_with_residual(jnp.asarray(tex).transpose(2, 0, 1),
                               jnp.asarray(uv), plan, interpret=True)
    ref_fwd = _grid_sample_fwd_impl(jnp.asarray(tex), jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(ref_fwd), atol=1e-5)


def test_bf16_kernels_close():
    """bf16 kernel compute stays within bf16 rounding of the f32 path."""
    uv = _smooth_uv(2, 24, 70, span=0.18)
    v, h, w = uv.shape[:3]
    g = RNG.normal(0, 1, size=(v, h, w, 3)).astype(np.float32)
    plan = plan_arrays_for_views(uv, 128, 256)
    out32 = splat_with_residual(jnp.asarray(g), jnp.asarray(uv), plan,
                                128, 256, compute="f32", interpret=True)
    out16 = splat_with_residual(jnp.asarray(g), jnp.asarray(uv), plan,
                                128, 256, compute="bf16", interpret=True)
    scale = np.abs(np.asarray(out32)).max()
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=2e-2 * scale)
