"""A/B the gather/splat kernels on the REAL seam-heavy demo-room uv at
different window choices (auto v4 pick vs v3-style aligned sizes).

Usage: python tools/demo_kernel_ab.py
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.ops.splat_pallas import (gather_with_residual,
                                            splat_with_residual)
from stylemesh_tpu.ops.splat_plan import plan_arrays_for_views

TEX = 4096
REPS = 10


def timed(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{dt:9.2f} ms  {name}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    if os.environ.get("AB_SYNTH") == "1":
        from stylemesh_tpu.data.synthetic import synthetic_view_batch
        b = synthetic_view_batch(num_views=4, content_hw=(256, 341),
            level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
            min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
        uv = np.asarray(b.uv[3])
    else:
        uvs = np.stack([
            np.load(f"/tmp/demo_room/train/images/scene0900_00/uv_784/{i}.npy")
            for i in range(4)])
        uv = (uvs[..., :2] * 2.0 - 1.0).astype(np.float32)
    tex_cf = jnp.asarray(rng.random((3, TEX, TEX), np.float32))
    uvj = jax.device_put(jnp.asarray(uv))
    g = jnp.asarray(rng.normal(size=uv.shape[:3] + (3,)), jnp.float32)

    for label, rh, rw in [("auto", None, None), ("v3ish 144x256", 144, 256),
                          ("256x256", 256, 256), ("152x96", 152, 96),
                          ("r2-pick 160x112", 160, 112),
                          ("small 96x64", 96, 64)]:
        plan = plan_arrays_for_views(uv, TEX, TEX, region_h=rh, region_w=rw)
        runs = int(plan.s_load.sum())
        cap = plan.res_texel.shape[-1]
        plan = jax.device_put(plan)
        gf = jax.jit(lambda t, u, p: gather_with_residual(
            t, u, p, compute="bf16"))
        sf = jax.jit(lambda gg, u, p: splat_with_residual(
            gg, u, p, TEX, TEX, compute="bf16"))
        print(f"== {label}: region ({plan.region_h},{plan.region_w}) "
              f"entries {plan.s_ids.shape[1]} runs {runs} cap {cap}",
              flush=True)
        out = gf(tex_cf, uvj, plan)
        print(f"   gather checksum {float(jnp.sum(out)):.3e}", flush=True)
        timed("  gather", gf, tex_cf, uvj, plan)
        outs = sf(g, uvj, plan)
        print(f"   splat checksum {float(jnp.sum(outs)):.3e}", flush=True)
        timed("  splat ", sf, g, uvj, plan)


if __name__ == "__main__":
    main()
