"""Multi-style sweep: independent per-style optimizations in one jitted step
with the style axis sharded over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.data.synthetic import synthetic_view_batch
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.vgg import init_vgg_params
from stylemesh_tpu.parallel.multistyle import MultiStylePipeline
import pytest

# whole-file slow mark: 109s on this 1-core image (measured
# round 5, /tmp/test_times.log methodology); the default gate
# deselects via pytest.ini addopts -m "not slow".
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(81)


def test_multistyle_matches_independent_runs():
    cfg = PipelineConfig(
        texture_width=64, texture_height=64, hierarchical_layers=1,
        content_weight=7e1, style_weight=1e-4, style_min_size=32,
        use_angle_weight=False, use_depth_scaling=False,
        learning_rate=0.5, use_splat_kernel=False)
    vgg = init_vgg_params(rng=6, scale=0.08)
    styles = [jnp.asarray((RNG.random((1, 64, 86, 3)).astype(np.float32) - 0.45) * 255)
              for _ in range(2)]
    batch = synthetic_view_batch(num_views=2, content_hw=(32, 42),
                                 level_heights=(32,), seed=7)

    multi = MultiStylePipeline(cfg, vgg, styles)
    mstate = multi.init()
    mstate, mlosses = multi.train_step(mstate, batch)
    mstate, mlosses = multi.train_step(mstate, batch)

    for s, style in enumerate(styles):
        single = TexturePipeline(cfg, vgg, style)
        st = single.init()
        for _ in range(2):
            st, losses = single.train_step(st, batch)
        np.testing.assert_allclose(float(mlosses["total"][s]),
                                   float(losses["total"]), rtol=1e-4,
                                   err_msg=f"style {s}")
        for a, b in zip(st.texture.layers, mstate.textures.layers):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b[s]),
                                       atol=1e-4)

    # the two styles produce different textures
    t0, t1 = np.asarray(mstate.textures.layers[0][0]), \
        np.asarray(mstate.textures.layers[0][1])
    assert np.abs(t0 - t1).max() > 1e-3


def test_multistyle_with_splat_plans():
    """Multi-style + Pallas plans: the style-sharded step loops local styles
    through the planned kernels (plans are style-invariant) and matches the
    per-style single runs."""
    from stylemesh_tpu.data.synthetic import with_splat_plans

    cfg = PipelineConfig(
        texture_width=128, texture_height=64, hierarchical_layers=1,
        content_weight=7e1, style_weight=1e-4, style_min_size=32,
        use_angle_weight=True, use_depth_scaling=False,
        learning_rate=0.5)
    vgg = init_vgg_params(rng=6, scale=0.08)
    styles = [jnp.asarray((RNG.random((1, 64, 86, 3)).astype(np.float32) - 0.45) * 255)
              for _ in range(2)]
    batch = synthetic_view_batch(num_views=2, content_hw=(32, 42),
                                 level_heights=(32,), seed=7)
    batch = with_splat_plans(batch, [(64, 128)], use_angle_weight=True)
    assert batch.splat_plans[0][0] is not None

    multi = MultiStylePipeline(cfg, vgg, styles)
    mstate = multi.init()
    aux = multi.prepare_batch(batch)
    mstate, mlosses = multi.train_step(mstate, batch, aux)

    for s, style in enumerate(styles):
        single = TexturePipeline(cfg, vgg, style)
        st, losses = single.train_step(single.init(), batch)
        np.testing.assert_allclose(float(mlosses["total"][s]),
                                   float(losses["total"]), rtol=1e-4,
                                   err_msg=f"style {s}")
        for a, b in zip(st.texture.layers, mstate.textures.layers):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b[s]),
                                       atol=1e-4)
