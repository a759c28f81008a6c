"""Empirical step anatomy: time jitted sub-graphs of the train step
(gather fwd, gather+splat vjp, VGG loss fwd, full step) and print a table.

The axon-tunnel profiler attributes Pallas custom-call time as 0ms, so the
trace alone cannot split kernel vs VGG time — wall-clocking compiled
sub-graphs can. Usage: python tools/step_anatomy.py [V]
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
REPS = 8


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{dt:9.1f} ms  {name}", flush=True)
    return dt


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
    layer_sizes = [(cfg.texture_height // 2 ** i, cfg.texture_width // 2 ** i)
                   for i in range(cfg.hierarchical_layers)]
    if os.environ.get("ANATOMY_DEMO") == "1":
        # the seam-heavy baked demo room, views spread around the orbit
        # (same batch as bench.py's demo_room metric)
        from stylemesh_tpu.data.loading import SceneCache
        from stylemesh_tpu.data.scenes import (discover_scannet_scenes,
                                               select_scene)

        root = os.environ.get("BENCH_DEMO_ROOT", "/tmp/stylemesh_demo_room")
        scenes = discover_scannet_scenes(os.path.join(root, "train", "images"),
                                         pyramid_levels=4,
                                         min_pyramid_height=256)
        cache = SceneCache(select_scene(scenes, min_images=1),
                           resize_size=256)
        cache.attach_splat_plans(layer_sizes, use_angle_weight=True,
                                 use_depth_scaling=True)
        n = cache.num_views
        batch = cache.get_batch([cache.indices[(i * n) // V]
                                 for i in range(V)])
    else:
        batch = synthetic_view_batch(
            num_views=V, content_hw=(256, 341),
            level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
            min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
        batch = with_splat_plans(batch, layer_sizes,
                                 use_angle_weight=cfg.use_angle_weight,
                                 use_depth_scaling=cfg.use_depth_scaling)
    batch = jax.device_put(batch)
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = pipe.prepare_batch(batch)
    jax.block_until_ready(aux)

    # --- sub-graphs (batch/aux passed as jit args: closing over them embeds
    # tens of MB of constants in the HLO, which the axon remote-compile
    # tunnel rejects with HTTP 413)
    render = jax.jit(lambda tex, b: pipe._render_pyramid(tex, b))

    def render_vjp(tex, b):
        pyr, vjp = jax.vjp(lambda t: pipe._render_pyramid(t, b), tex)
        return vjp([jnp.ones_like(p) for p in pyr])

    render_bwd = jax.jit(render_vjp)

    def loss_only(tex, b, a):
        return pipe.loss_fn(tex, b, state.gram_cache, a)[0]

    loss_fwd = jax.jit(loss_only)
    loss_grad = jax.jit(jax.grad(loss_only))

    pyr_const = render(state.texture, batch)
    jax.block_until_ready(pyr_const)

    def loss_from_pyr(pyr, b, a):
        style_l, content_l, _ = pipe.loss(
            pipe.vgg_params, pipe.style_targets, pyr, b.rgb,
            a.pyramid_masks, b.angle_degrees, None, aux=a.loss_aux)
        return cfg.style_weight * style_l + cfg.content_weight * content_l

    vgg_fwd = jax.jit(loss_from_pyr)
    vgg_grad = jax.jit(jax.grad(loss_from_pyr))

    print(f"# V={V} bf16 kernels, remat={cfg.remat_vgg}", flush=True)
    t_render = timed("render fwd (gather x16)", render, state.texture, batch)
    t_rbwd = timed("render fwd+vjp (gather+splat x16)", render_bwd,
                   state.texture, batch)
    t_vfwd = timed("loss fwd from const pyramid (VGG fwd)", vgg_fwd,
                   pyr_const, batch, aux)
    t_vbwd = timed("loss grad from const pyramid (VGG fwd+bwd)", vgg_grad,
                   pyr_const, batch, aux)
    t_lfwd = timed("full loss fwd", loss_fwd, state.texture, batch, aux)
    t_lgrad = timed("full loss grad", loss_grad, state.texture, batch, aux)
    step = jax.jit(lambda s, b, a: pipe._train_step(s, b, a))
    t_step = timed("full train step", step, state, batch, aux)
    print(f"# splat-only estimate: {t_rbwd - t_render:9.1f} ms")
    print(f"# optimizer+clamp est.: {t_step - t_lgrad:9.1f} ms")


if __name__ == "__main__":
    main()
