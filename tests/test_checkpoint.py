"""Checkpoint/resume: orbax round-trip of the full train state (texture +
Adam moments + step + gram cache) must continue training identically."""

import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.data.synthetic import synthetic_view_batch
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.vgg import init_vgg_params
from stylemesh_tpu.utils.checkpoint import restore_train_state, save_train_state
import pytest

# whole-file slow mark: 135s on this 1-core image (measured
# round 5, /tmp/test_times.log methodology); the default gate
# deselects via pytest.ini addopts -m "not slow".
pytestmark = pytest.mark.slow

RNG = np.random.default_rng(51)


def test_train_state_roundtrip_and_resume(tmp_path):
    cfg = PipelineConfig(
        texture_width=64, texture_height=64, hierarchical_layers=2,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        gram_mode="average", style_min_size=32, learning_rate=0.5)
    vgg = init_vgg_params(rng=3, scale=0.08)
    style = jnp.asarray((RNG.random((1, 96, 128, 3)).astype(np.float32) - 0.45) * 255)
    batch = synthetic_view_batch(num_views=2, content_hw=(32, 42),
                                 level_heights=(32, 48), seed=2)
    pipe = TexturePipeline(cfg, vgg, style)

    state = pipe.init()
    for _ in range(2):
        state, _ = pipe.train_step(state, batch)
    path = str(tmp_path / "ckpt")
    save_train_state(state, path)

    restored = restore_train_state(pipe.init(), path)
    assert int(restored.step) == 2
    for a, b in zip(state.texture.layers, restored.texture.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state.gram_cache.count),
                                  np.asarray(restored.gram_cache.count))

    # continuing from the restored state matches continuing in-memory
    cont_a, la = pipe.train_step(state, batch)
    cont_b, lb = pipe.train_step(restored, batch)
    np.testing.assert_allclose(float(la["total"]), float(lb["total"]), rtol=1e-6)
    for a, b in zip(cont_a.texture.layers, cont_b.texture.layers):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
