"""On-TPU parity of planned gather/splat vs the XLA reference path for every
(level, layer) pair of the BAKED DEMO ROOM batch (tools/splat_tpu_parity.py
covers the synthetic scene; the demo room exercises multi-island plans —
and tools/kernel_breakdown.py shows per-pair anomalies there that could be
dead-grid bugs rather than speed).

Usage: python tools/demo_kernel_parity.py [V]
"""

import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/stylemesh_tpu/jax_comp_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.data.grad_masks import grad_weight_masks
from stylemesh_tpu.data.loading import SceneCache
from stylemesh_tpu.data.scenes import discover_scannet_scenes, select_scene
from stylemesh_tpu.ops.grid_sample import (_scatter_add_grad, grid_sample,
                                           grid_sample_planned_cf)

V = int(sys.argv[1]) if len(sys.argv) > 1 else 4
LAYER_SIZES = [(4096 // 2 ** i, 4096 // 2 ** i) for i in range(4)]


def main():
    root = os.environ.get("BENCH_DEMO_ROOT", "/tmp/stylemesh_demo_room")
    scenes = discover_scannet_scenes(os.path.join(root, "train", "images"),
                                     pyramid_levels=4, min_pyramid_height=256)
    cache = SceneCache(select_scene(scenes, min_images=1), resize_size=256)
    cache.attach_splat_plans(LAYER_SIZES, use_angle_weight=True,
                             use_depth_scaling=True)
    n = cache.num_views
    batch = jax.device_put(
        cache.get_batch([cache.indices[(i * n) // V] for i in range(V)]))

    # gradient-weight masks: splat plans drop provably-zero-gradient tiles,
    # so the scatter reference must be masked the same way
    level_shapes = [tuple(u.shape[1:3]) for u in batch.uv]
    wmasks = grad_weight_masks(cache.get_batch(
        [cache.indices[(i * n) // V] for i in range(V)]), level_shapes,
        True, True)

    rng = np.random.default_rng(0)
    bad = 0
    for li, (uv, plans) in enumerate(zip(batch.uv, batch.splat_plans)):
        for lj, plan in enumerate(plans):
            if plan is None:
                continue
            th, tw = LAYER_SIZES[lj]
            tex = jnp.asarray(rng.random((th, tw, 3), np.float32))
            tex_cf = jnp.asarray(np.moveaxis(np.asarray(tex), -1, 0).copy())

            ref_g = jax.jit(grid_sample)(tex, uv)
            got_g = jax.jit(lambda t, u, p: grid_sample_planned_cf(
                t, u, p, "f32"))(tex_cf, uv, plan)
            dg = float(jnp.max(jnp.abs(ref_g - got_g)))

            cot = jnp.asarray(
                rng.random(uv.shape[:3] + (3,), np.float32) - 0.5)
            cot = cot * jnp.asarray(np.asarray(wmasks[li]) > 0,
                                    jnp.float32)[..., None]

            def splat_fn(t, u, p, g):
                _, vjp = jax.vjp(
                    lambda tt: grid_sample_planned_cf(tt, u, p, "f32"), t)
                return vjp(g)[0]

            got_s = jax.jit(splat_fn)(tex_cf, uv, plan, cot)
            ref_s = jax.jit(lambda g, u: _scatter_add_grad(g, u, th, tw))(
                cot, uv)
            ds = float(jnp.max(jnp.abs(jnp.moveaxis(got_s, 0, -1) - ref_s)))
            ok = dg < 1e-4 and ds < 1e-4
            bad += not ok
            print(f"L{li} tex{th:5d}: gather maxdiff {dg:.2e} "
                  f"splat maxdiff {ds:.2e} {'OK' if ok else 'FAIL'}",
                  flush=True)
    print("ALL OK" if bad == 0 else f"{bad} PAIRS FAILED")


if __name__ == "__main__":
    main()
