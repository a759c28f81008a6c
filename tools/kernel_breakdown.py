"""Per-(level, layer) Pallas gather/splat timing on a real batch.

Pinpoints which of the 16 (pyramid level x texture layer) kernel calls the
demo room's 185 ms gather / 193 ms splat actually go to (the plan tables in
tools/plan_stats.py say entry counts; this says milliseconds).

Usage: ANATOMY_DEMO=1 python tools/kernel_breakdown.py [V]
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
from stylemesh_tpu.ops.grid_sample import grid_sample_planned_cf

V = int(sys.argv[1]) if len(sys.argv) > 1 else 4
REPS = 10
LAYER_SIZES = [(4096 // 2 ** i, 4096 // 2 ** i) for i in range(4)]


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
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
        cache.attach_splat_plans(LAYER_SIZES, use_angle_weight=True,
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
        batch = with_splat_plans(batch, LAYER_SIZES, use_angle_weight=True,
                                 use_depth_scaling=True)
        label = "synthetic"
    batch = jax.device_put(batch)
    tex_cf = [jax.device_put(np.zeros((3,) + s, np.float32))
              for s in LAYER_SIZES]

    print(f"# {label} V={V} bf16 kernels", flush=True)
    tot_g = tot_s = 0.0
    for li, (uv, plans) in enumerate(zip(batch.uv, batch.splat_plans)):
        for lj, plan in enumerate(plans):
            if plan is None:
                continue

            g_fn = jax.jit(lambda t, u, p: grid_sample_planned_cf(
                t, u, p, "bf16").sum())

            def s_fn(t, u, p):
                _, vjp = jax.vjp(
                    lambda tt: grid_sample_planned_cf(tt, u, p, "bf16"), t)
                return vjp(jnp.ones(u.shape[:3] + (3,), jnp.float32))

            s_fn = jax.jit(s_fn)
            tg = timed(g_fn, tex_cf[lj], uv, plan)
            ts = timed(s_fn, tex_cf[lj], uv, plan)
            tot_g += tg
            tot_s += ts
            ent_g = int(np.asarray(plan.g_alive).sum())
            ent_s = int(np.asarray(plan.s_alive).sum())
            print(f"L{li} tex{LAYER_SIZES[lj][0]:5d}: gather {tg:7.2f} ms "
                  f"({ent_g:5d} e, {1e3 * tg / max(ent_g, 1):6.1f} us/e)  "
                  f"splat {ts:7.2f} ms ({ent_s:5d} e, "
                  f"{1e3 * ts / max(ent_s, 1):6.1f} us/e)  "
                  f"win {plan.region_h}x{plan.region_w}", flush=True)
    print(f"# total gather {tot_g:.1f} ms, splat(+gatherDCE?) {tot_s:.1f} ms")


if __name__ == "__main__":
    main()
