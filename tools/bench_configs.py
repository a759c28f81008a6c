"""Single-chip views/s for the remaining BASELINE.json configs.

bench.py's two headline numbers cover the single-scene ScanNet-style
synthetic config and the seam-heavy demo room. This tool times the other
three on the one real chip:

- matterport_4096: Matterport-style large-view-batch (V=8, 4:3.2 pano-crop
  aspect) full-method step at the same 4096^2 x4 atlas.
- atlas_sharded_1band: AtlasShardedPipeline over a 1-device mesh (n_bands=1
  degenerate banding) — quantifies the banded-kernel + shard_map overhead
  against the plain pipeline at the same shapes.
- multistyle_per_style: MultiStylePipeline with one style on a 1-device
  mesh — views/s per style; the sweep scales styles across chips with no
  gradient traffic, so per-style throughput is the whole story.

Writes results/config_bench.json. Usage: python tools/bench_configs.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

STEPS = 10


def _cfg(batch_views, tex=4096, layers=4):
    from stylemesh_tpu.models.pipeline import PipelineConfig

    return PipelineConfig(
        steps_per_epoch=1,
        texture_width=tex, texture_height=tex, hierarchical_layers=layers,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, compute_dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT, remat_vgg=False,
        kernel_compute="bf16")


def _batch(v, content_hw, level_heights, aspect):
    from stylemesh_tpu.data.synthetic import (synthetic_view_batch,
                                              with_splat_plans)

    b = synthetic_view_batch(num_views=v, content_hw=content_hw,
                             level_heights=level_heights, aspect=aspect,
                             min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
    layer_sizes = [(4096 // 2 ** i, 4096 // 2 ** i) for i in range(4)]
    return with_splat_plans(b, layer_sizes, use_angle_weight=True,
                            use_depth_scaling=True)


def _time_pipe(pipe, state, batch, v):
    # amortized-batch regime, like bench.py: prepare once, step repeatedly
    # (the reference's --index_repeat trains each batch ~20 steps)
    aux = jax.block_until_ready(pipe.prepare_batch(batch))
    args = (batch, aux)
    state, losses = pipe.train_step(state, *args)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, losses = pipe.train_step(state, *args)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / STEPS
    return v / dt, dt * 1e3


def main():
    from stylemesh_tpu.models.pipeline import TexturePipeline
    from stylemesh_tpu.models.vgg import init_vgg_params
    from stylemesh_tpu.parallel.atlas import (AtlasShardedPipeline,
                                              with_banded_splat_plans)
    from stylemesh_tpu.parallel.mesh import make_mesh
    from stylemesh_tpu.parallel.multistyle import MultiStylePipeline
    from stylemesh_tpu.data.synthetic import synthetic_view_batch

    rng = np.random.default_rng(0)
    vgg = init_vgg_params(rng=0, scale=0.05)
    style = jnp.asarray(
        (rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    res = {"steps": STEPS, "device": jax.devices()[0].device_kind}

    # ---- Matterport-style: large view batch, pano-crop 1280x1024 aspect
    v = int(os.environ.get("BENCH_MP_VIEWS", "8"))
    cfg = _cfg(v)
    batch = jax.device_put(_batch(v, (256, 320), (256, 432, 608, 784),
                                  1280.0 / 1024.0))
    pipe = TexturePipeline(cfg, vgg, style)
    try:
        state = pipe.init()
        vps, ms = _time_pipe(pipe, state, batch, v)
        res["matterport_4096"] = {"views_per_sec": round(vps, 3),
                                  "step_ms": round(ms, 1), "views": v}
        print(f"# matterport_4096 V={v}: {vps:.3f} views/s ({ms:.1f} ms)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        res["matterport_4096"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# matterport_4096 FAILED {type(e).__name__}", flush=True)

    # ---- atlas-sharded, 1-band degenerate on the single real chip
    v = 4
    cfg = _cfg(v)
    b = synthetic_view_batch(num_views=v, content_hw=(256, 341),
                             level_heights=(256, 432, 608, 784),
                             aspect=1280.0 / 960.0, min_depth=0.25, seed=0,
                             depth_range=(0.4, 7.0))
    layer_sizes = [(4096 >> i, 4096 >> i) for i in range(4)]
    bb = jax.device_put(with_banded_splat_plans(
        b, layer_sizes, n_bands=1, use_angle_weight=True,
        use_depth_scaling=True))
    mesh = make_mesh(jax.devices()[:1], axis_name="atlas")
    atlas = AtlasShardedPipeline(cfg, vgg, style, mesh=mesh)
    try:
        a_state = atlas.init()
        vps, ms = _time_pipe(atlas, a_state, bb, v)
        res["atlas_sharded_1band"] = {"views_per_sec": round(vps, 3),
                                      "step_ms": round(ms, 1), "views": v}
        print(f"# atlas_sharded_1band V={v}: {vps:.3f} views/s ({ms:.1f} ms)",
              flush=True)
    except Exception as e:  # noqa: BLE001
        res["atlas_sharded_1band"] = {
            "error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# atlas_sharded_1band FAILED {type(e).__name__}", flush=True)

    # ---- multi-style sweep, one style on the one chip (per-style rate)
    v = 4
    cfg = _cfg(v)
    batch = jax.device_put(_batch(v, (256, 341), (256, 432, 608, 784),
                                  1280.0 / 960.0))
    ms_pipe = MultiStylePipeline(cfg, vgg, [style],
                                 mesh=make_mesh(jax.devices()[:1],
                                                axis_name="style"))
    try:
        m_state = ms_pipe.init()
        vps, msec = _time_pipe(ms_pipe, m_state, batch, v)
        res["multistyle_per_style"] = {"views_per_sec": round(vps, 3),
                                       "step_ms": round(msec, 1), "views": v}
        print(f"# multistyle_per_style V={v}: {vps:.3f} views/s "
              f"({msec:.1f} ms)", flush=True)
    except Exception as e:  # noqa: BLE001
        res["multistyle_per_style"] = {
            "error": f"{type(e).__name__}: {e}"[:300]}
        print(f"# multistyle_per_style FAILED {type(e).__name__}", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "config_bench.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
