"""Is the step device-bound or dispatch-bound? Run N train steps inside ONE
jit via lax.fori_loop (zero per-step host dispatch) and compare with the
python-loop dispatch pattern the bench/training loop uses.

Usage: python tools/fori_probe.py [V] [N]
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
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10


def main():
    cfg = PipelineConfig(
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, decay_step_size=3,
        compute_dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT,
        remat_vgg=V > 4, remat_min_px=600_000, kernel_compute="bf16")
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
    batch = jax.device_put(batch)
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = jax.block_until_ready(pipe.prepare_batch(batch))

    # --- python-loop dispatch (current pattern)
    state1, losses = pipe.train_step(state, batch, aux)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    s = state1
    for _ in range(N):
        s, losses = pipe.train_step(s, batch, aux)
    jax.block_until_ready(losses)
    dt_py = (time.perf_counter() - t0) / N * 1e3
    print(f"python-loop dispatch: {dt_py:8.1f} ms/step", flush=True)

    # --- fori_loop: N steps in one executable
    def chunk(state, batch, aux):
        return jax.lax.fori_loop(
            0, N, lambda _, st: pipe._train_step(st, batch, aux)[0], state)

    chunk_j = jax.jit(chunk, donate_argnums=(0,))
    s2 = chunk_j(s, batch, aux)  # s: the python-loop's final state (alive)
    jax.block_until_ready(s2)
    t0 = time.perf_counter()
    s2 = chunk_j(s2, batch, aux)
    jax.block_until_ready(s2)
    dt_fori = (time.perf_counter() - t0) / N * 1e3
    print(f"fori-loop on device:  {dt_fori:8.1f} ms/step", flush=True)
    print(f"# dispatch overhead per step: {dt_py - dt_fori:.1f} ms")


if __name__ == "__main__":
    main()
