"""On-TPU parity of the planned gather/splat kernels vs the XLA reference
path (grid_sample / scatter-add). Catches DMA-ordering races the CPU
interpret tests cannot. Usage: python tools/splat_tpu_parity.py
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.data.synthetic import synthetic_view_batch
from stylemesh_tpu.ops.grid_sample import grid_sample, _scatter_add_grad
from stylemesh_tpu.ops.splat_pallas import (gather_with_residual,
                                            splat_with_residual)
from stylemesh_tpu.ops.splat_plan import plan_arrays_for_views

TEX = 1024


def main():
    rng = np.random.default_rng(0)
    batch = synthetic_view_batch(
        num_views=2, content_hw=(256, 341),
        level_heights=(256, 432), aspect=1280.0 / 960.0,
        min_depth=0.25, seed=3, depth_range=(0.4, 7.0))
    tex = jnp.asarray(rng.random((TEX, TEX, 3), np.float32))
    tex_cf = jnp.transpose(tex, (2, 0, 1))

    for li, uv in enumerate(batch.uv):
        uv_np = np.asarray(uv)
        plan = plan_arrays_for_views(uv_np, TEX, TEX)
        plan = jax.device_put(plan)
        uvj = jnp.asarray(uv)

        ref = grid_sample(tex, uvj)  # [V, H, W, 3]
        got = gather_with_residual(tex_cf, uvj, plan, compute="f32")
        err = float(jnp.abs(ref - got).max())
        print(f"level {li}: gather max err {err:.3e}", flush=True)
        assert err < 1e-5, err

        g = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
        ref_g = _scatter_add_grad(g, uvj, TEX, TEX)  # [TEX, TEX, 3]
        got_g = splat_with_residual(g, uvj, plan, TEX, TEX, compute="f32")
        ref_cf = jnp.transpose(ref_g, (2, 0, 1))
        gerr = float(jnp.abs(ref_cf - got_g).max())
        scale = float(jnp.abs(ref_cf).max())
        print(f"level {li}: splat max err {gerr:.3e} (scale {scale:.2f})",
              flush=True)
        assert gerr / scale < 1e-5, gerr
    print("TPU parity OK", flush=True)


if __name__ == "__main__":
    main()
