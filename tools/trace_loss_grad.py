"""Trace ONLY the loss-grad-from-const-pyramid graph and print top device ops
with their source metadata (args.long_name / tf_op), to attribute copies and
fusions to loss components.

Usage: python tools/trace_loss_grad.py [V]
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

from stylemesh_tpu.data.synthetic import synthetic_view_batch
from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.vgg import init_vgg_params

V = int(sys.argv[1]) if len(sys.argv) > 1 else 4
OUT = "/tmp/sm_trace_lossgrad"


def main():
    cfg = PipelineConfig(
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, decay_step_size=3,
        compute_dtype=jnp.bfloat16, precision=jax.lax.Precision.DEFAULT,
        remat_vgg=V > 2, remat_min_px=600_000, kernel_compute="bf16")
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
    pyr = [p.astype(jnp.bfloat16) for p in
           jax.block_until_ready(render(state.texture, batch))]

    def loss_from_pyr(pyr):
        style_l, content_l, _ = pipe.loss(
            pipe.vgg_params, pipe.style_targets, pyr, batch.rgb,
            aux.pyramid_masks, batch.angle_degrees, None, aux=aux.loss_aux)
        return cfg.style_weight * style_l + cfg.content_weight * content_l

    g = jax.jit(jax.grad(loss_from_pyr))
    out = g(pyr)
    jax.block_until_ready(out)

    jax.profiler.start_trace(OUT)
    for _ in range(3):
        out = g(pyr)
    jax.block_until_ready(out)
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
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(lambda: [0.0, 0, ""])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_"):
            continue  # parent span
        args = e.get("args", {}) or {}
        meta = args.get("long_name") or args.get("tf_op") or ""
        d = float(e.get("dur", 0.0))
        a = agg[name]
        a[0] += d
        a[1] += 1
        if meta and not a[2]:
            a[2] = meta
        total += d
    print(f"trace: {files[-1]}")
    print(f"summed op time: {total / 1e3 / 3:.1f} ms/step (3 reps)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:45]
    for name, (d, c, meta) in rows:
        print(f"{d / 1e3 / 3:8.2f} ms x{c // 3:<3d} {name[:40]:40s} {meta[:90]}")


if __name__ == "__main__":
    main()
