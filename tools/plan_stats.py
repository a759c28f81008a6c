"""Print splat-plan statistics for a baked scene: per (level, layer) the
chosen window, entry/run/residual counts and the residual fraction of all
4-corner contributions. The planner's cost model is judged by these numbers
(VERDICT r2: demo-room residuals were 46k-88k per level at layer 0).

Usage: python tools/plan_stats.py [scene_root=/tmp/demo_room] [V=4]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from stylemesh_tpu.data.grad_masks import grad_weight_masks
from stylemesh_tpu.data.loading import SceneCache
from stylemesh_tpu.data.scenes import discover_scannet_scenes, select_scene
from stylemesh_tpu.ops import splat_plan as sp


def main(root="/tmp/demo_room", n_views=4):
    scenes = discover_scannet_scenes(f"{root}/train/images", pyramid_levels=4,
                                     min_pyramid_height=256)
    spec = select_scene(scenes, min_images=1)
    cache = SceneCache(spec, resize_size=256)
    b = cache._batch_all
    layer_sizes = [(4096 // 2 ** i, 4096 // 2 ** i) for i in range(4)]
    level_shapes = [tuple(u.shape[1:3]) for u in b.uv]
    wmasks = grad_weight_masks(b, level_shapes, True, True)

    pos = np.arange(n_views)
    grand_res, grand_corners = 0, 0
    for li, uv in enumerate(b.uv):
        uvv = np.asarray(uv)[pos]
        wm = None if wmasks is None else np.asarray(wmasks[li])[pos]
        h, w = uvv.shape[1:3]
        for (th, tw) in layer_sizes:
            if th % 8 or tw % 128:
                continue
            t0 = time.time()
            plan = sp.plan_arrays_for_views(uvv, th, tw, weight_masks=wm)
            dt = time.time() - t0
            n_px = h * w
            corners = 4 * n_px * len(pos)
            res = int((plan.res_weight != 0).sum())
            s_alive = int(plan.s_alive.sum())
            g_alive = int(plan.g_alive.sum())
            s_loads = int((plan.s_load * plan.s_alive).sum())
            g_loads = int((plan.g_load * plan.g_alive).sum())
            n_split = int((plan.labels > 0).sum())
            grand_res += res
            grand_corners += corners
            print(f"L{li} ({h}x{w}) tex {th}x{tw}: window "
                  f"{plan.region_h}x{plan.region_w} "
                  f"gather {g_alive} entries/{g_loads} loads, "
                  f"splat {s_alive} entries/{s_loads} loads "
                  f"(cap {plan.s_ids.shape[1]}), "
                  f"split-px {n_split}, residuals {res} "
                  f"({100.0 * res / corners:.2f}% of {corners} corners) "
                  f"[plan {dt:.1f}s]")
    print(f"TOTAL residuals {grand_res} / {grand_corners} corners "
          f"= {100.0 * grand_res / grand_corners:.3f}%")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/demo_room",
         int(sys.argv[2]) if len(sys.argv) > 2 else 4)
