"""Decompose the VGG loss step: trunk convs vs gram/mask/pool overhead.

Times, at the bench shapes (V views, 4 pyramid levels):
  1. trunk encode fwd (all levels)            — raw conv+pool cost
  2. trunk encode fwd+vjp (ones cotangents)   — conv backward cost
  3. loss fwd from const pyramid              — adds grams/masks/factors
  4. loss grad from const pyramid             — adds gram backward
The 3-1 and 4-2 gaps are the non-conv loss overhead. Usage:
  python tools/loss_anatomy.py [V]  (STYLEMESH_FAST_CONV=0 to pin XLA convs)
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

from stylemesh_tpu.data.synthetic import synthetic_view_batch
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.vgg import init_vgg_params, vgg_features

V = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = 8
KEYS = ("r11", "r21", "r31", "r41", "r51", "r42")


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
    mode = os.environ.get("ANAT_MODE", "multi")  # 'multi' | 'single'
    remat = os.environ.get("ANAT_REMAT", "1") == "1" and V > 2
    cfg = PipelineConfig(
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode=mode, angle_threshold=30.0,
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
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()
    aux = pipe.prepare_batch(batch)
    jax.block_until_ready(aux)
    render = jax.jit(lambda tex, b: pipe._render_pyramid(tex, b))
    pyr = render(state.texture, batch)
    pyr = [p.astype(jnp.bfloat16) for p in jax.block_until_ready(pyr)]

    fast = os.environ.get("STYLEMESH_FAST_CONV", "0")
    print(f"# V={V} fast_conv={fast} mode={mode} remat={remat}", flush=True)

    def encode_all(pyr):
        return [vgg_features(vgg, p, KEYS, compute_dtype=jnp.bfloat16,
                             precision=jax.lax.Precision.DEFAULT)
                for p in pyr]

    enc_fwd = jax.jit(encode_all)

    def enc_sum(pyr):
        encs = encode_all(pyr)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2)
                   for e in encs for o in e.values())

    enc_grad = jax.jit(jax.grad(enc_sum))

    def loss_from_pyr(pyr):
        style_l, content_l, _ = pipe.loss(
            pipe.vgg_params, pipe.style_targets, pyr, batch.rgb,
            aux.pyramid_masks, batch.angle_degrees, None, aux=aux.loss_aux)
        return cfg.style_weight * style_l + cfg.content_weight * content_l

    vgg_fwd = jax.jit(loss_from_pyr)
    vgg_grad = jax.jit(jax.grad(loss_from_pyr))

    t1 = timed("trunk encode fwd (4 levels)", enc_fwd, pyr)
    t2 = timed("trunk encode fwd+vjp", enc_grad, pyr)
    t3 = timed("loss fwd from const pyramid", vgg_fwd, pyr)
    t4 = timed("loss grad from const pyramid", vgg_grad, pyr)
    print(f"# non-conv overhead: fwd {t3 - t1:.1f} ms, grad {t4 - t2:.1f} ms")


if __name__ == "__main__":
    main()
