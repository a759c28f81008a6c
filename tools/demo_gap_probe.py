"""Decompose the demo-room full-loss-grad 'gap' (anatomy shows 639 ms full
grad vs 427 ms component sum at V=4).

The step_anatomy render-vjp probe discards the primal pyramid, so XLA may
DCE the gather forward — making its "splat-only estimate" (t_rbwd -
t_render) meaningless on plan-heavy scenes. This probe measures each piece
without DCE holes and takes a custom-call census of the optimized HLO so
gather/splat recomputation (if any) is visible directly.

Usage: ANATOMY_DEMO=1 python tools/demo_gap_probe.py [V]
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


def census(name, jitted, *args):
    txt = jitted.lower(*args).compile().as_text()
    counts = {}
    for key in ("tpu_custom_call", "convolution", "select-and-scatter",
                "gather_kernel", "splat_kernel", "_gather", "_splat"):
        counts[key] = txt.count(key)
    print(f"# HLO census [{name}]: {counts}", flush=True)


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
    style = jnp.asarray(
        (rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    layer_sizes = [(cfg.texture_height // 2 ** i, cfg.texture_width // 2 ** i)
                   for i in range(cfg.hierarchical_layers)]
    if os.environ.get("ANATOMY_DEMO", "1") == "1":
        from stylemesh_tpu.data.loading import SceneCache
        from stylemesh_tpu.data.scenes import (discover_scannet_scenes,
                                               select_scene)

        root = os.environ.get("BENCH_DEMO_ROOT", "/tmp/stylemesh_demo_room")
        scenes = discover_scannet_scenes(
            os.path.join(root, "train", "images"), pyramid_levels=4,
            min_pyramid_height=256)
        cache = SceneCache(select_scene(scenes, min_images=1),
                           resize_size=256)
        cache.attach_splat_plans(layer_sizes, use_angle_weight=True,
                                 use_depth_scaling=True)
        n = cache.num_views
        batch = cache.get_batch([cache.indices[(i * n) // V]
                                 for i in range(V)])
        label = "demo-room"
    else:
        batch = synthetic_view_batch(
            num_views=V, content_hw=(256, 341),
            level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
            min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
        batch = with_splat_plans(batch, layer_sizes,
                                 use_angle_weight=cfg.use_angle_weight,
                                 use_depth_scaling=cfg.use_depth_scaling)
        label = "synthetic"
    batch = jax.device_put(batch)
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = pipe.prepare_batch(batch)
    jax.block_until_ready(aux)
    print(f"# {label} V={V} remat={cfg.remat_vgg}", flush=True)

    # 1. gather forward alone (primal consumed via a sum, cannot DCE)
    gather_f = jax.jit(lambda tex, b: [p.sum() for p in
                                       pipe._render_pyramid(tex, b)])

    # 2. splat (and maybe gather, if XLA can't DCE it): vjp with the primal
    #    discarded — the census below says whether the gather survived
    def _splat_only(tex, b):
        _, vjp = jax.vjp(lambda t: pipe._render_pyramid(t, b), tex)
        return vjp([jnp.ones(u.shape[:3] + (3,), jnp.float32)
                    for u in b.uv])

    splat_f = jax.jit(_splat_only)

    # 3. gather + splat composed, primal consumed (what the step pays)
    def _gather_splat(tex, b):
        pyr, vjp = jax.vjp(lambda t: pipe._render_pyramid(t, b), tex)
        g = vjp([jnp.ones_like(p) for p in pyr])
        return [p.sum() for p in pyr], g

    both_f = jax.jit(_gather_splat)

    # 4. VGG loss grad from const pyramid (residual-free reference)
    def loss_from_pyr(pyr, b, a):
        style_l, content_l, _ = pipe.loss(
            pipe.vgg_params, pipe.style_targets, pyr, b.rgb,
            a.pyramid_masks, b.angle_degrees, None, aux=a.loss_aux)
        return cfg.style_weight * style_l + cfg.content_weight * content_l

    pyr_const = jax.block_until_ready(
        jax.jit(lambda t, b: pipe._render_pyramid(t, b))(state.texture, batch))
    vgg_grad = jax.jit(jax.grad(loss_from_pyr))

    # 5. the full loss grad
    def loss_only(tex, b, a):
        return pipe.loss_fn(tex, b, state.gram_cache, a)[0]

    loss_grad = jax.jit(jax.grad(loss_only))

    t1 = timed("gather fwd (sum-consumed)", gather_f, state.texture, batch)
    t2 = timed("splat only (linear_transpose)", splat_f, state.texture, batch)
    t3 = timed("gather+splat composed", both_f, state.texture, batch)
    t4 = timed("VGG loss grad from const pyramid", vgg_grad, pyr_const,
               batch, aux)
    t5 = timed("full loss grad", loss_grad, state.texture, batch, aux)
    print(f"# components gather {t1:.0f} + splat {t2:.0f} + vgg {t4:.0f} "
          f"= {t1 + t2 + t4:.0f} vs composed g+s {t3:.0f}, full {t5:.0f}")

    census("gather fwd", gather_f, state.texture, batch)
    census("splat only", splat_f, state.texture, batch)
    census("full loss grad", loss_grad, state.texture, batch, aux)


if __name__ == "__main__":
    main()
