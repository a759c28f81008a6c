"""Component-level timing of the full-method train step on the real chip.

Times each piece of the bench workload (4096^2 x 4 layers, 4-level pyramid)
as its own jitted function so the step anatomy is measured, not guessed:

  prep     masks / depth-interp weights / angle resizes (batch-constant!)
  gather   forward texture sampling, all (level, layer) pairs
  splat    backward of the sampling (grad - forward, reported separately)
  vgg_fwd  loss forward given fixed pred images (VGG + grams + resizes)
  vgg_bwd  loss forward+backward given fixed pred images
  step     the full train step (reference number)

Usage: python tools/profile_step.py [V]
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
from stylemesh_tpu.models.pipeline import (
    PipelineConfig,
    TexturePipeline,
    depth_interpolation_weights,
    depth_pyramid_masks,
)
from stylemesh_tpu.models.texture import sample_texture
from stylemesh_tpu.models.vgg import init_vgg_params
from stylemesh_tpu.ops.resize import resize_bilinear

V = int(sys.argv[1]) if len(sys.argv) > 1 else 2
REPS = int(os.environ.get("PROF_REPS", "10"))


def bench_fn(name, fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:28s} {dt * 1e3:9.1f} ms   (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    cfg = PipelineConfig(
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, decay_step_size=3,
        compute_dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT,
        remat_vgg=V > 2)
    vgg = init_vgg_params(rng=0, scale=0.05)
    rng = np.random.default_rng(0)
    style = jnp.asarray((rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    batch = synthetic_view_batch(
        num_views=V, content_hw=(256, 341),
        level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=0)
    layer_sizes = [(cfg.texture_height // 2 ** i, cfg.texture_width // 2 ** i)
                   for i in range(cfg.hierarchical_layers)]
    print("planning...", flush=True)
    batch = with_splat_plans(batch, layer_sizes,
                             use_angle_weight=cfg.use_angle_weight,
                             use_depth_scaling=cfg.use_depth_scaling)
    for li, per_layer in enumerate(batch.splat_plans):
        for lj, p in enumerate(per_layer):
            print(f"  level {li} layer {lj}: tiles={p.g_ids.shape} "
                  f"region={p.region_h}x{p.region_w} "
                  f"splat_sched={p.s_ids.shape} live={int(p.s_alive.sum())} "
                  f"loads={int(p.s_load.sum())} has2={int(p.s_has2.sum())} "
                  f"res_cap={p.res_texel.shape[1]}", flush=True)

    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    level_shapes = [tuple(u.shape[1:3]) for u in batch.uv]

    # --- prep: all batch-constant mask/weight work
    @jax.jit
    def prep(b):
        m = depth_pyramid_masks(b, level_shapes)
        w = depth_interpolation_weights(b, level_shapes)
        a = [resize_bilinear(b.angle_guidance.astype(jnp.float32), hw)
             for hw in level_shapes]
        return m, w, a

    bench_fn("prep(masks+weights)", prep, batch)

    # --- gather: forward sampling only
    @jax.jit
    def gather_all(tex, b):
        return [sample_texture(tex, uv, plans=pl)
                for uv, pl in zip(b.uv, b.splat_plans)]

    t_gather = bench_fn("gather fwd (16 pairs)", gather_all, state.texture, batch)

    # --- gather+splat: value_and_grad through sampling only
    @jax.jit
    def sample_loss(tex, b):
        preds = [sample_texture(tex, uv, plans=pl)
                 for uv, pl in zip(b.uv, b.splat_plans)]
        return sum(jnp.sum(p * (0.1 + 0.001 * i)) for i, p in enumerate(preds))

    g_fn = jax.jit(jax.grad(sample_loss))
    t_both = bench_fn("gather+splat grad", g_fn, state.texture, batch)
    print(f"{'  -> splat bwd (approx)':28s} {(t_both - t_gather) * 1e3:9.1f} ms",
          flush=True)

    # --- XLA-scatter comparison at one (level, layer) pair
    @jax.jit
    def sample_loss_xla(tex, b):
        preds = [sample_texture(tex, uv) for uv in b.uv]
        return sum(jnp.sum(p) * 0.1 for p in preds)

    # --- loss given fixed pred images (VGG + grams + factor machinery)
    preds_fixed = jax.block_until_ready(gather_all(state.texture, batch))

    masks_fixed, interp_fixed, angles_fixed = jax.block_until_ready(prep(batch))

    def loss_from_preds(preds, b):
        pyr = [p * 1.0 for p in preds]
        sl, cl, _ = pipe.loss(pipe.vgg_params, pipe.style_targets, pyr,
                              b.rgb, masks_fixed, b.angle_degrees, None)
        return cfg.style_weight * sl + cfg.content_weight * cl

    bench_fn("loss fwd (fixed preds)", jax.jit(loss_from_preds), preds_fixed, batch)
    bench_fn("loss fwd+bwd (fixed preds)",
             jax.jit(jax.grad(loss_from_preds)), preds_fixed, batch)

    # --- full step
    def step(s, b):
        return pipe.train_step(s, b)

    t0 = time.perf_counter()
    s2, losses = step(state, batch)
    jax.block_until_ready(losses)
    print(f"full step compile+1: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    s = s2
    for _ in range(REPS):
        s, losses = step(s, batch)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{'full train step':28s} {dt * 1e3:9.1f} ms", flush=True)
    print(f"views/s: {V / dt:.3f}", flush=True)


if __name__ == "__main__":
    main()
