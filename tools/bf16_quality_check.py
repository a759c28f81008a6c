"""Convergence parity check: f32 vs bf16 splat/gather kernel compute.

Runs the bench workload for N steps with both kernel dtypes from the same
init and prints the loss trajectories + final relative gap. Justifies (or
vetoes) bf16 kernels as the bench/production default.
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

STEPS = int(os.environ.get("QC_STEPS", "40"))
V = 2


def run(kernel_compute):
    cfg = PipelineConfig(
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, decay_step_size=3,
        compute_dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT,
        kernel_compute=kernel_compute, remat_vgg=False)
    vgg = init_vgg_params(rng=0, scale=0.05)
    rng = np.random.default_rng(0)
    style = jnp.asarray((rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    batch = synthetic_view_batch(
        num_views=V, content_hw=(256, 341),
        level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
    layer_sizes = [(4096 // 2 ** i, 4096 // 2 ** i) for i in range(4)]
    batch = with_splat_plans(batch, layer_sizes, use_angle_weight=True,
                             use_depth_scaling=True)
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = pipe.prepare_batch(batch)
    traj = []
    for i in range(STEPS):
        state, losses = pipe.train_step(state, batch, aux)
        if i % 5 == 0 or i == STEPS - 1:
            traj.append((i, float(losses["total"]), float(losses["style"]),
                         float(losses["content"])))
    jax.block_until_ready(state.texture.layers[0])
    return traj


def main():
    t32 = run("f32")
    t16 = run("bf16")
    print(f"{'step':>5} {'total_f32':>14} {'total_bf16':>14} {'rel':>9}")
    for (i, a, sa, ca), (_, b, sb, cb) in zip(t32, t16):
        rel = abs(b - a) / max(abs(a), 1e-9)
        print(f"{i:5d} {a:14.1f} {b:14.1f} {rel:9.5f}")
    final_rel = abs(t16[-1][1] - t32[-1][1]) / abs(t32[-1][1])
    print(f"final relative gap: {final_rel:.5f}")


if __name__ == "__main__":
    main()
