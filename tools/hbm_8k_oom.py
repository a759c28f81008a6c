"""OOM repro: an 8192^2 x 4-layer full-method step does NOT fit one v5e chip
unsharded — the measurable premise of atlas sharding (parallel/atlas.py).

Arithmetic first (printed), then the on-hardware attempt:

- texture params (f32 Laplacian pyramid 8192/4096/2048/1024):
  1.328 * 8192^2 * 3 * 4 B = 1.07 GB; + grad + Adam m + v = 4.28 GB state.
- the measured 4096^2 full-method step at V=4 peaks ~14.4 GB of TEMP on top
  of 0.27 GB of params (tools/hbm_probe.py, round 2): the texture-dependent
  share (gather one-hots, pyramid upsample chain, splat residuals) scales
  ~4x with the 4x texel count.
- v5e HBM = 16 GB. 4.28 GB state + >>12 GB temps > 16 GB.

Expected outcome on hardware: RESOURCE_EXHAUSTED from XLA. Prints one JSON
line either way: {"config", "fits", "error"}.

Usage (real chip): python tools/hbm_8k_oom.py [views]
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")


def main(views=4):
    import numpy as np

    state_gb = 1.328 * 8192 ** 2 * 3 * 4 * 4 / 1e9
    print(f"# state arithmetic: texture+grad+adam = {state_gb:.2f} GB f32; "
          f"v5e HBM = 16 GB; measured 4096^2 V=4 temp was ~14.4 GB",
          file=sys.stderr)

    import jax
    import jax.numpy as jnp

    from stylemesh_tpu.data.synthetic import (
        synthetic_view_batch,
        with_splat_plans,
    )
    from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
    from stylemesh_tpu.models.vgg import init_vgg_params

    cfg = PipelineConfig(
        texture_width=8192, texture_height=8192, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        compute_dtype=jnp.bfloat16, kernel_compute="bf16",
        learning_rate=1.0, decay_step_size=3)
    vgg = init_vgg_params(rng=0, scale=0.05)
    rng = np.random.default_rng(0)
    style = jnp.asarray(
        (rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    batch = synthetic_view_batch(
        num_views=views, content_hw=(256, 341),
        level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
    layer_sizes = [(8192 >> i, 8192 >> i) for i in range(4)]
    batch = with_splat_plans(batch, layer_sizes, use_angle_weight=True,
                             use_depth_scaling=True)
    batch = jax.device_put(batch)
    pipe = TexturePipeline(cfg, vgg, style)
    result = {"config": f"8192^2x4 full method V={views} unsharded",
              "state_gb": round(state_gb, 2)}
    try:
        state = pipe.init()
        aux = jax.block_until_ready(pipe.prepare_batch(batch))
        state, losses = pipe.train_step(state, batch, aux)
        jax.block_until_ready(losses)
        result["fits"] = True
    except Exception as e:  # expected: RESOURCE_EXHAUSTED
        s = str(e)
        oom = ("RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s
               or "tpu_compile_helper" in s)
        result["fits"] = False
        result["oom"] = oom
        result["error"] = s.splitlines()[0][:300]
    print(json.dumps(result))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)
