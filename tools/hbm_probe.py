"""Compile (AOT, no run) the train step and print XLA's memory analysis —
peak temp allocation, argument/output sizes — with remat on vs off.

Usage: python tools/hbm_probe.py [V]
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.data.synthetic import synthetic_view_batch, with_splat_plans
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.vgg import init_vgg_params

V = int(sys.argv[1]) if len(sys.argv) > 1 else 4


def report(remat):
    cfg = PipelineConfig(
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, decay_step_size=3,
        compute_dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT,
        remat_vgg=remat, remat_min_px=600_000, kernel_compute="bf16")
    vgg = init_vgg_params(rng=0, scale=0.05)
    rng = np.random.default_rng(0)
    style = jnp.asarray((rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    batch = synthetic_view_batch(
        num_views=V, content_hw=(256, 341),
        level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
    layer_sizes = [(cfg.texture_height // 2 ** i, cfg.texture_width // 2 ** i)
                   for i in range(cfg.hierarchical_layers)]
    batch = with_splat_plans(batch, layer_sizes,
                             use_angle_weight=cfg.use_angle_weight,
                             use_depth_scaling=cfg.use_depth_scaling)
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = pipe.prepare_batch(batch)
    lowered = jax.jit(pipe._train_step).lower(state, batch, aux)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    gb = 1 / (1024 ** 3)
    print(f"# remat={remat}: temp {m.temp_size_in_bytes * gb:.2f} GB, "
          f"args {m.argument_size_in_bytes * gb:.2f} GB, "
          f"out {m.output_size_in_bytes * gb:.2f} GB, "
          f"alias {m.alias_size_in_bytes * gb:.2f} GB", flush=True)


if __name__ == "__main__":
    for r in (True, False):
        try:
            report(r)
        except Exception as e:
            print(f"# remat={r}: FAILED {str(e)[:200]}")
