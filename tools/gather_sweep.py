"""Confirm what the gather kernel's cost scales with: window area (matmul),
window perimeter (one-hot builds), or DMA. Times gather_pallas at the L3
bench level with forced region sizes. Usage: python tools/gather_sweep.py
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

from stylemesh_tpu.data.synthetic import synthetic_view_batch
from stylemesh_tpu.ops.splat_pallas import gather_with_residual
from stylemesh_tpu.ops.splat_plan import plan_arrays_for_views

TEX = 4096
REPS = 10


def main():
    rng = np.random.default_rng(0)
    batch = synthetic_view_batch(
        num_views=4, content_hw=(256, 341),
        level_heights=(256, 432, 608, 784), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=0, depth_range=(0.4, 7.0))
    uv = np.asarray(batch.uv[3])  # largest level
    tex_cf = jnp.asarray(rng.random((3, TEX, TEX), np.float32))
    uvj = jax.device_put(jnp.asarray(uv))

    for (rh, rw) in [(None, None), (32, 256), (64, 256), (128, 256),
                     (64, 384), (64, 512), (128, 512)]:
        plan = plan_arrays_for_views(uv, TEX, TEX, region_h=rh, region_w=rw)
        n_entries = plan.g_ids.shape[1]
        plan = jax.device_put(plan)
        fn = jax.jit(lambda t, u, p: gather_with_residual(
            t, u, p, compute="bf16"))
        out = fn(tex_cf, uvj, plan)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(tex_cf, uvj, plan)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"region {plan.region_h:4d}x{plan.region_w:4d} "
              f"entries/view {n_entries:6d}: {dt:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
