"""On-device window-size sweep for the gather/splat kernels on the REAL
demo-room uv maps, per (uv level, texture layer). Prints measured ms plus
plan stats for each candidate — the data that calibrates choose_region's
cost model (the round-3 recalibration source).

Usage: python tools/window_sweep.py [pairs]
  pairs: comma list like "0:4096,1:4096,1:2048" (uv level : tex size);
         default sweeps the known offenders.
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

from stylemesh_tpu.data.loading import SceneCache
from stylemesh_tpu.data.scenes import discover_scannet_scenes, select_scene
from stylemesh_tpu.ops import splat_plan as sp
from stylemesh_tpu.ops.splat_pallas import (gather_with_residual,
                                            splat_with_residual)

REPS = 10
V = 4


def timed(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3


def candidates(uv, tex):
    """Window candidates spanning the regimes: all-fits, q85+2, 2x median,
    median, plus the auto pick."""
    fh_all, fw_all = [], []
    for v in range(uv.shape[0]):
        uvt = sp.tile_uv(np.asarray(uv[v], np.float32))
        iy0, _, ix0, _, _, _ = sp._corner_data(uvt, tex, tex)
        valid = ((uvt[..., 0] > -5.0)
                 & ~((uvt[..., 0] == -1.0) & (uvt[..., 1] == -1.0)))
        av = valid.any(axis=1)
        fh_all.append((np.max(np.where(valid, iy0, -1), axis=1)
                       - np.min(np.where(valid, iy0, tex), axis=1))[av])
        fw_all.append((np.max(np.where(valid, ix0, -1), axis=1)
                       - np.min(np.where(valid, ix0, tex), axis=1))[av])
    fh = np.concatenate(fh_all)
    fw = np.concatenate(fw_all)

    # the planner's own size constraints — the sweep must price exactly the
    # candidate set choose_region can emit
    def clamp(h, w):
        return sp.clamp_window_hw(int(h), int(w), tex, tex)

    cands = []
    for q, f in [(1.0, 1), (0.85, 1), (0.5, 2), (0.5, 1)]:
        c = clamp((np.quantile(fh, q) + 2) * f, (np.quantile(fw, q) + 2) * f)
        if c not in cands:
            cands.append(c)
    auto = sp.choose_region(uv, tex, tex)
    if auto not in cands:
        cands.append(auto)
    return cands, auto


def main(pairs):
    root = os.environ.get("BENCH_DEMO_ROOT", "/tmp/stylemesh_demo_room")
    scenes = discover_scannet_scenes(os.path.join(root, "train", "images"),
                                     pyramid_levels=4, min_pyramid_height=256)
    cache = SceneCache(select_scene(scenes, min_images=1), resize_size=256)
    b = cache._batch_all
    n = cache.num_views
    pos = [(i * n) // V for i in range(V)]
    rng = np.random.default_rng(0)

    for li, tex in pairs:
        uv = np.asarray(b.uv[li])[pos]
        cands, auto = candidates(uv, tex)
        tex_cf = jnp.asarray(rng.random((3, tex, tex), np.float32))
        uvj = jax.device_put(jnp.asarray(uv))
        g = jnp.asarray(rng.normal(size=uv.shape[:3] + (3,)), jnp.float32)
        print(f"=== L{li} ({uv.shape[1]}x{uv.shape[2]}) tex {tex} "
              f"auto={auto} ===", flush=True)
        for rh, rw in cands:
            plan = sp.plan_arrays_for_views(uv, tex, tex,
                                            region_h=rh, region_w=rw)
            ent = int(plan.g_alive.sum())
            loads = int((plan.g_load * plan.g_alive).sum())
            res = int((plan.res_weight != 0).sum())
            cap = plan.res_texel.shape[-1]
            plan = jax.device_put(plan)
            gf = jax.jit(lambda t, u, p: gather_with_residual(
                t, u, p, compute="bf16"))
            sf = jax.jit(lambda gg, u, p: splat_with_residual(
                gg, u, p, tex, tex, compute="bf16"))
            tg = timed(gf, tex_cf, uvj, plan)
            ts = timed(sf, g, uvj, plan)
            per = (tg + ts) / max(ent, 1) * 1e3
            print(f"  ({rh:4d},{rw:4d}) entries {ent:5d} loads {loads:5d} "
                  f"res {res:6d} cap {cap:6d}: gather {tg:7.2f} ms "
                  f"splat {ts:7.2f} ms  ({per:.1f} us/entry g+s)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        pairs = [tuple(int(x) for x in p.split(":"))
                 for p in sys.argv[1].split(",")]
    else:
        pairs = [(0, 4096), (1, 4096), (2, 4096), (3, 4096), (1, 2048)]
    main(pairs)
