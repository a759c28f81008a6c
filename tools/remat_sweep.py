"""Time the full train step across remat policies (one real chip).

Usage: python tools/remat_sweep.py [V]
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.data.synthetic import synthetic_view_batch, with_splat_plans
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.vgg import init_vgg_params

V = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = 10


def build_batch(cfg):
    batch = synthetic_view_batch(
        num_views=V, content_hw=(256, 341),
        level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
    layer_sizes = [(cfg.texture_height // 2 ** i, cfg.texture_width // 2 ** i)
                   for i in range(cfg.hierarchical_layers)]
    return with_splat_plans(batch, layer_sizes,
                            use_angle_weight=cfg.use_angle_weight,
                            use_depth_scaling=cfg.use_depth_scaling)


def run(remat, remat_min_px, batch=None):
    cfg = PipelineConfig(
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, decay_step_size=3,
        compute_dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT,
        kernel_compute="bf16", remat_vgg=remat, remat_min_px=remat_min_px)
    if batch is None:
        batch = build_batch(cfg)
    vgg = init_vgg_params(rng=0, scale=0.05)
    rng = np.random.default_rng(0)
    style = jnp.asarray((rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = pipe.prepare_batch(batch)
    try:
        state, losses = pipe.train_step(state, batch, aux)
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        for _ in range(REPS):
            state, losses = pipe.train_step(state, batch, aux)
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / REPS
        print(f"remat={remat} min_px={remat_min_px}: {dt * 1e3:8.1f} ms/step"
              f" = {V / dt:6.3f} views/s", flush=True)
    except Exception as e:
        s = str(e)
        tag = "OOM" if ("RESOURCE_EXHAUSTED" in s or "memory" in s.lower()) \
            else "ERR: " + s[:160]
        print(f"remat={remat} min_px={remat_min_px}: {tag}", flush=True)
    return batch


def main():
    batch = run(True, 0)  # baseline: remat everything
    run(True, 400_000, batch)   # remat levels 2,3 only
    run(True, 600_000, batch)   # remat level 3 only
    run(False, 0, batch)        # no remat (may OOM at V=4)


if __name__ == "__main__":
    main()
