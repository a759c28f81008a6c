"""Benchmark: texture-optimization throughput at the reference's headline
workload (the `with_angle_and_depth` full method config — see BASELINE.md):

- 4096^2 texture atlas x 4 Laplacian layers
- content views at 256px (256 x 341, the ScanNet 4:3 resize)
- 4-level UV pyramid at native heights 256/432/608/784 (aspect 1280/960)
- full loss: VGG style+content, angle weighting, depth-scaled pyramid,
  texture regularizer; Adam.

The metric is optimized *views per second per chip*: the reference processes
exactly one view per optimizer step (batch_size=1), so views/sec equals the
reference's steps/sec and is batch-size-fair for the TPU pipeline.

vs_baseline compares against an estimated reference throughput of 4.0
views/sec on A100 (the repo publishes no numbers — BASELINE.md; this
estimate assumes ~60 VGG-16 conv passes/sec at 256-784px on A100 per the
4-level pyramid forward+backward).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: the full-method graph compiles slowly on this
# backend; repeated bench runs (and the driver's) hit the cache
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

REFERENCE_A100_VIEWS_PER_SEC = 4.0  # documented estimate, see module docstring
BATCH_VIEWS = int(os.environ.get("BENCH_VIEWS", "4"))
STEPS = int(os.environ.get("BENCH_STEPS", "10"))
INDEX_REPEAT = 20  # the reference's own repeat factor (scannet scripts)


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _is_oom(e):
    s = str(e)
    return ("RESOURCE_EXHAUSTED" in s or "Ran out of memory" in s
            or "tpu_compile_helper" in s)


def _require_device(timeout_s=300):
    """Fail fast (clean JSON, nonzero exit) when the TPU tunnel is down.

    A down axon tunnel makes device init HANG indefinitely rather than
    error, which would stall the whole bench run; a slow-but-alive backend
    always initializes well inside the timeout (compile slowness comes
    later and is unaffected)."""
    import threading

    import jax

    done = threading.Event()
    out = []

    def probe():
        out.append(jax.devices())
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(json.dumps({
            "metric": "views_per_sec_per_chip", "value": 0.0,
            "unit": "views/s", "vs_baseline": 0.0,
            "error": f"device init did not complete in {timeout_s}s "
                     f"(TPU tunnel down?)"}))
        os._exit(3)
    _log(f"devices: {out[0]}")


def main():
    _require_device()
    v = BATCH_VIEWS
    while True:
        try:
            result = _run_bench(v)
            break
        except Exception as e:  # HBM headroom varies with kernel versions
            if not _is_oom(e) or v <= 1:
                raise
            v = v // 2
            _log(f"exhausted HBM; retrying V={v}")
            import gc

            gc.collect()
    # second metric: the seam-heavy baked demo room (multi-island Blender-
    # style atlas, real cross-island windows) — the honest real-scene number
    # (VERDICT r2: the smooth synthetic scene hides the seam cost)
    if os.environ.get("BENCH_DEMO") != "0":
        try:
            demo = _run_demo_bench(min(v, 4))
            result["demo_room_views_per_sec"] = demo
            result["demo_room_vs_baseline"] = round(
                demo / REFERENCE_A100_VIEWS_PER_SEC, 3)
        except Exception as e:
            _log(f"demo-room bench failed ({type(e).__name__}): {e}")
    print(json.dumps(result))


def _demo_scene_root():
    """Bake the demo-room scene once (idempotent, ~2 min cold)."""
    import subprocess

    root = os.environ.get("BENCH_DEMO_ROOT", "/tmp/stylemesh_demo_room")
    probe = os.path.join(root, "train", "images")
    if not os.path.isdir(probe):
        _log("baking demo-room scene (one-time)...")
        script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "make_demo_scene.py")
        subprocess.run([sys.executable, script, root], check=True,
                       capture_output=True)
    return root


def _bench_cfg(batch_views):
    import jax
    import jax.numpy as jnp

    from stylemesh_tpu.models.pipeline import PipelineConfig

    return PipelineConfig(
        steps_per_epoch=1,
        texture_width=4096, texture_height=4096, hierarchical_layers=4,
        use_angle_weight=True, use_depth_scaling=True,
        content_weight=7e1, style_weight=1e-4, tex_reg_weight=5e3,
        style_pyramid_mode="multi", angle_threshold=30.0,
        learning_rate=1.0, decay_step_size=3,
        compute_dtype=jnp.bfloat16,
        precision=jax.lax.Precision.DEFAULT,
        # bf16 kernel compute tracks f32 to 5e-5 relative loss over 40 steps
        # (tools/bf16_quality_check.py) and is ~22% faster end to end
        kernel_compute="f32" if os.environ.get("BENCH_KERNEL_BF16") == "0"
        else "bf16",
        # The fused gram kernel dropped the step's saved-residual footprint
        # (no more F*m copies): V=4 now fits HBM without remat (14.4 GB temp,
        # tools/hbm_probe.py) and runs ~3% faster (9.72 vs 9.44 views/s).
        # Larger view batches still rematerialize the biggest pyramid level.
        remat_vgg=(batch_views > 4
                   and os.environ.get("BENCH_NO_REMAT") != "1"),
        remat_min_px=600_000,
    )


def _step_cost(pipe, state, batch, aux):
    """(flops, bytes) of the jitted train step from XLA's own cost analysis.

    Uses an explicit lower().compile() — after the first pipe.train_step the
    persistent compile cache makes this a deserialize, not a recompile.
    Two documented biases pull the resulting MFU in opposite directions
    (ADVICE r4): Pallas custom calls count as 0 FLOPs (they do VPU one-hot
    work, not MXU work — understates), while XLA's 'flops' total includes
    VPU elementwise/transcendental flops divided here by the bf16 MXU peak
    (overstates slightly). The number is the honest MXU-utilization read up
    to those stated approximations."""
    exe = pipe._jit_train_step.lower(state, batch, aux).compile()
    ca = exe.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _time_steps(pipe, batch, label, result=None):
    import jax

    state = pipe.init()
    _log(f"[{label}] compiling train step...")
    t_c = time.perf_counter()
    aux = jax.block_until_ready(pipe.prepare_batch(batch))
    state, losses = pipe.train_step(state, batch, aux)
    jax.block_until_ready(losses)
    _log(f"[{label}] compile+first step: {time.perf_counter() - t_c:.1f}s")

    t_p = time.perf_counter()
    aux = jax.block_until_ready(pipe.prepare_batch(batch))
    prepare_s = time.perf_counter() - t_p
    _log(f"[{label}] prepare_batch: {prepare_s * 1e3:.1f} ms "
         f"(amortized /{INDEX_REPEAT})")

    fl = by = 0.0
    if result is not None and os.environ.get("BENCH_MFU") != "0":
        try:
            fl, by = _step_cost(pipe, state, batch, aux)
        except Exception as e:  # cost analysis is reporting, never fatal
            _log(f"[{label}] step cost analysis failed: {e}")

    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, losses = pipe.train_step(state, batch, aux)
    jax.block_until_ready(losses)
    _log(f"[{label}] {STEPS} steps: {time.perf_counter() - t0:.2f}s elapsed")
    dt = time.perf_counter() - t0 + prepare_s * STEPS / INDEX_REPEAT
    batch_views = batch.rgb.shape[0]
    if result is not None and fl > 0.0:
        from stylemesh_tpu.utils.tpu_peaks import device_peaks, peaks_assumed

        peak_fl, peak_hbm = device_peaks()
        if peaks_assumed():
            result["peaks_assumed"] = True  # see tpu_peaks.device_peaks
        step_s = dt / STEPS
        result["step_ms"] = round(step_s * 1e3, 1)
        result["achieved_tflops"] = round(fl / step_s / 1e12, 2)
        result["mfu"] = round(fl / step_s / peak_fl, 4)
        result["hbm_gbps"] = round(by / step_s / 1e9, 1)
        result["hbm_util"] = round(by / step_s / peak_hbm, 4)
        _log(f"[{label}] MFU {result['mfu']:.1%} "
             f"({result['achieved_tflops']} TF/s vs {peak_fl / 1e12:.0f} peak), "
             f"HBM {result['hbm_gbps']} GB/s ({result['hbm_util']:.1%})")
    return STEPS * batch_views / dt


def _run_demo_bench(batch_views):
    import jax
    import jax.numpy as jnp

    from stylemesh_tpu.data.loading import SceneCache
    from stylemesh_tpu.data.scenes import discover_scannet_scenes, select_scene
    from stylemesh_tpu.models.pipeline import TexturePipeline
    from stylemesh_tpu.models.vgg import init_vgg_params

    root = _demo_scene_root()
    cfg = _bench_cfg(batch_views)
    scenes = discover_scannet_scenes(os.path.join(root, "train", "images"),
                                     pyramid_levels=4, min_pyramid_height=256)
    spec = select_scene(scenes, min_images=1)
    cache = SceneCache(spec, resize_size=256)
    _log("planning demo-room splat windows...")
    layer_sizes = [(4096 // 2 ** i, 4096 // 2 ** i) for i in range(4)]
    cache.attach_splat_plans(layer_sizes, use_angle_weight=True,
                             use_depth_scaling=True)
    # views spread around the orbit (adjacent orbit views are near-identical)
    n = cache.num_views
    idx = [cache.indices[(i * n) // batch_views] for i in range(batch_views)]
    batch = jax.device_put(cache.get_batch(idx))

    vgg = init_vgg_params(rng=0, scale=0.05)
    rng = np.random.default_rng(0)
    style = jnp.asarray(
        (rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)
    pipe = TexturePipeline(cfg, vgg, style)
    return round(_time_steps(pipe, batch, "demo-room"), 3)


def _run_bench(batch_views):
    import jax
    import jax.numpy as jnp

    from stylemesh_tpu.data.synthetic import synthetic_view_batch
    from stylemesh_tpu.models.pipeline import TexturePipeline
    from stylemesh_tpu.models.vgg import init_vgg_params

    cfg = _bench_cfg(batch_views)
    vgg = init_vgg_params(rng=0, scale=0.05)
    rng = np.random.default_rng(0)
    style = jnp.asarray((rng.random((1, 512, 683, 3), dtype=np.float32) - 0.45) * 255.0)

    # depth 0.4..7.0m spans all four pyramid levels (uv heights ~51..896 vs
    # level heights 256..784) so every level carries live loss + gradients,
    # like a real room scan — a shallow ramp would let the dead-tile planner
    # skip most of the splat work and flatter the number
    batch = synthetic_view_batch(
        num_views=batch_views, content_hw=(256, 341),
        level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
    if os.environ.get("BENCH_NO_SPLAT_KERNEL") != "1":
        from stylemesh_tpu.data.synthetic import with_splat_plans

        layer_sizes = [(cfg.texture_height // 2 ** i, cfg.texture_width // 2 ** i)
                       for i in range(cfg.hierarchical_layers)]
        _log("planning Pallas splat windows...")
        batch = with_splat_plans(batch, layer_sizes,
                                 use_angle_weight=cfg.use_angle_weight,
                                 use_depth_scaling=cfg.use_depth_scaling)

    _log(f"devices: {jax.devices()}")
    # plans/uv are host numpy; place them once so steps don't re-upload
    # ~100MB of schedules per call (the upload serializes dispatch).
    # The batch-constant precompute (prepare_batch) is timed separately and
    # amortized over the reference's own repeat factor (--index_repeat 20 in
    # the scannet launch scripts): in production each batch is prepared once
    # and trained for 20 consecutive steps. Steps are dispatched back-to-back
    # (state chains on device) as in the real loop (optimize.py defers loss
    # fetches).
    batch = jax.device_put(batch)
    pipe = TexturePipeline(cfg, vgg, style)
    result = {
        "metric": "views_per_sec_per_chip_full_method_4096sq_x4",
        "unit": "views/s",
    }
    views_per_sec = _time_steps(pipe, batch, "synthetic", result=result)
    result["value"] = round(views_per_sec, 3)
    result["vs_baseline"] = round(
        views_per_sec / REFERENCE_A100_VIEWS_PER_SEC, 3)
    return result


if __name__ == "__main__":
    main()
