"""Capture a jax.profiler trace of the full train step and print the top ops
by total device time (parsed from the trace protobuf/json — no TensorBoard).

Usage: python tools/trace_step.py [V] [outdir]
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.data.synthetic import synthetic_view_batch, with_splat_plans
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.vgg import init_vgg_params

V = int(sys.argv[1]) if len(sys.argv) > 1 else 2
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sm_trace"


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
    pipe = TexturePipeline(cfg, vgg, style)
    state = pipe.init()

    # compile + warm
    aux = pipe.prepare_batch(batch)
    state, losses = pipe.train_step(state, batch, aux)
    jax.block_until_ready(losses)

    jax.profiler.start_trace(OUT)
    for _ in range(3):
        state, losses = pipe.train_step(state, batch, aux)
    jax.block_until_ready(losses)
    jax.profiler.stop_trace()
    time.sleep(2)
    summarize(OUT)


def summarize(out):
    files = sorted(glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no trace json found under", out)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-side lanes (TensorCore); host threads excluded by pid name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname and "/device" not in pname:
            continue
        name = e.get("name", "?")
        d = float(e.get("dur", 0.0))
        dur_by_name[name] += d
        cnt_by_name[name] += 1
        total += d
    print(f"trace: {files[-1]}")
    print(f"total device-op time: {total / 1e3 / 3:.1f} ms/step over 3 steps")
    rows = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:60]
    for name, d in rows:
        print(f"{d / 1e3 / 3:9.2f} ms  x{cnt_by_name[name] // 3:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
