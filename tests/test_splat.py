"""Pallas splat kernel correctness vs the reference XLA scatter-add backward
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.ops.grid_sample import _scatter_add_grad
from stylemesh_tpu.ops.splat_pallas import splat_pallas, splat_with_residual
from stylemesh_tpu.ops.splat_plan import (
    PlanArrays,
    pad_residuals,
    plan_splat,
)


def _to_plan_arrays(plans):
    rt, rp, rw = pad_residuals(plans)
    return PlanArrays(
        origins=jnp.asarray(np.concatenate([p.origins for p in plans])),
        origins2=jnp.asarray(np.concatenate([p.origins2 for p in plans])),
        has2=jnp.asarray(np.concatenate([p.has2 for p in plans])),
        res_texel=jnp.asarray(rt), res_pixel=jnp.asarray(rp),
        res_weight=jnp.asarray(rw))

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


def _run(uv, tex_h, tex_w, region_h=32, region_w=128):
    v, h, w = uv.shape[:3]
    g = RNG.normal(0, 1, size=(v, h, w, 3)).astype(np.float32)
    plans = [plan_splat(uv[i], tex_h, tex_w, region_h, region_w)
             for i in range(v)]
    out = splat_with_residual(
        jnp.asarray(g), jnp.asarray(uv), _to_plan_arrays(plans),
        tex_h, tex_w, region_h=region_h, region_w=region_w, interpret=True)
    ref = _reference_grad(g, uv, tex_h, tex_w)
    return np.asarray(out), ref, plans


def test_splat_smooth_uv_no_residual():
    uv = _smooth_uv(2, 24, 70, span=0.18)  # footprint fits the window
    out, ref, plans = _run(uv, 128, 256)
    assert all(p.res_count == 0 for p in plans)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_with_island_seam_second_window():
    uv = _seamed_uv(1, 20, 128)
    out, ref, plans = _run(uv, 128, 256)
    # the seam now engages the secondary window instead of residuals
    assert plans[0].has2.sum() > 0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_three_island_residual():
    """Three uv clusters in one tile: primary + secondary windows plus a
    non-empty residual remainder."""
    uv = _smooth_uv(1, 16, 64, span=0.05, offset=0.05)
    uv[:, :, 20:40, 1] += 0.5
    uv[:, :, 40:, 1] += 1.2
    uv = np.clip(uv, -1, 1).astype(np.float32)
    out, ref, plans = _run(uv, 1024, 128, region_h=32, region_w=128)
    assert plans[0].has2.sum() > 0
    assert plans[0].res_count > 0
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_border_clamp():
    """uv beyond [-1,1] clamps to the border (duplicate-corner adds)."""
    uv = _smooth_uv(1, 16, 64, span=1.4, offset=-0.2)  # exceeds the atlas
    uv = uv.astype(np.float32)
    out, ref, plans = _run(uv, 64, 128, region_h=64, region_w=128)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_splat_padded_pixels_ignored():
    # h, w deliberately not multiples of the tile size
    uv = _smooth_uv(1, 19, 45, span=0.2)
    out, ref, _ = _run(uv, 128, 256)
    np.testing.assert_allclose(out, ref, atol=1e-4)


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
    batch_p = with_splat_plans(batch, [(128, 128)])
    grads_plan = jax.grad(lambda t: pipe.loss_fn(t, batch_p, None)[0])(tex)
    for a, b in zip(grads_plain.layers, grads_plan.layers):
        b = np.asarray(b)
        # MXU vs scatter accumulation order: ~1e-4 relative on f32
        np.testing.assert_allclose(np.asarray(a), b,
                                   atol=5e-4 * max(np.abs(b).max(), 1.0))


def test_planned_forward_matches_xla_gather():
    """NOTE: grid_sample_planned runs the kernels at the default region size,
    so plans must be built with the defaults too (plan_arrays_for_views)."""
    from stylemesh_tpu.ops.grid_sample import _grid_sample_fwd_impl, grid_sample_planned
    from stylemesh_tpu.ops.splat_plan import plan_arrays_for_views

    tex = RNG.normal(0, 1, (128, 256, 3)).astype(np.float32)
    for name, uv in [("smooth", _smooth_uv(2, 24, 70, span=0.18)),
                     ("clamped", _smooth_uv(1, 16, 64, span=1.4, offset=-0.2))]:
        plan = plan_arrays_for_views(uv, 128, 256)
        out = grid_sample_planned(jnp.asarray(tex), jnp.asarray(uv), plan)
        ref = _grid_sample_fwd_impl(jnp.asarray(tex), jnp.asarray(uv))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, err_msg=name)


def test_planned_forward_residual_path():
    """A vertical UV seam on a tall atlas exceeds the 128-row window and
    exercises the forward residual overlay."""
    from stylemesh_tpu.ops.grid_sample import _grid_sample_fwd_impl, grid_sample_planned
    from stylemesh_tpu.ops.splat_plan import plan_arrays_for_views, plan_splat

    tex = RNG.normal(0, 1, (1024, 128, 3)).astype(np.float32)
    uv = _smooth_uv(1, 32, 64, span=0.1, offset=0.1)
    uv[:, 8:, :, 1] += 0.9  # jump in y inside the tiles
    uv = np.clip(uv, -1, 1).astype(np.float32)
    assert plan_splat(uv[0], 1024, 128).res_count > 0
    plan = plan_arrays_for_views(uv, 1024, 128)
    out = grid_sample_planned(jnp.asarray(tex), jnp.asarray(uv), plan)
    ref = _grid_sample_fwd_impl(jnp.asarray(tex), jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_splat_background_pixels_analytic():
    """Pixels at grid exactly (-1,-1) (baked-uv background) must hit texel
    (0,0) with weight 1 via the analytic path — both directions."""
    from stylemesh_tpu.ops.grid_sample import _grid_sample_fwd_impl
    from stylemesh_tpu.ops.splat_pallas import gather_with_residual
    from stylemesh_tpu.ops.splat_plan import pad_residuals

    uv = _smooth_uv(1, 24, 70, span=0.15, offset=0.4)
    uv[:, :6, :, :] = -1.0  # background strip
    uv = uv.astype(np.float32)
    out, ref, plans = _run(uv, 128, 256)
    # backward: background never lands in the residual lists
    np.testing.assert_allclose(out, ref, atol=1e-4)

    tex = RNG.normal(0, 1, (128, 256, 3)).astype(np.float32)
    fwd = gather_with_residual(jnp.asarray(tex), jnp.asarray(uv),
                               _to_plan_arrays(plans),
                               interpret=True, region_h=32, region_w=128)
    ref_fwd = _grid_sample_fwd_impl(jnp.asarray(tex), jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(ref_fwd), atol=1e-5)
