"""Synthetic scenes: procedurally generated view batches with analytically
consistent UV / angle / depth maps.

Replaces the reference's OpenGL preprocessing for unit tests and
hardware-independent benchmarking: a virtual camera orbits a textured plane
("wall") so every pixel has a well-defined UV coordinate, viewing angle and
depth — the exact output contract of the reference's render_uv tools
(/root/reference/scripts/scannet/render_uv/src/main.cpp:58-67) without any
mesh or GL context.
"""

import numpy as np

from stylemesh_tpu.data.depth_level import calculate_depth_level
from stylemesh_tpu.data.schema import ViewBatch


def with_splat_plans(batch: ViewBatch, layer_sizes, use_angle_weight=False,
                     use_depth_scaling=False):
    """Attach Pallas splat plans for the given texture layer sizes to any
    ViewBatch (host-side planning; layers not (8,128)-aligned get None and
    fall back to the XLA scatter).

    When the gradient-reweighting flags are passed (matching the pipeline
    config the batch will train under), tiles whose gradient is provably
    zeroed by the angle/depth weights are dropped from the splat schedule
    (see data/grad_masks.py)."""
    from stylemesh_tpu.data.grad_masks import grad_weight_masks
    from stylemesh_tpu.ops.splat_plan import plan_arrays_for_views

    level_shapes = [tuple(u.shape[1:3]) for u in batch.uv]
    wmasks = grad_weight_masks(batch, level_shapes, use_angle_weight,
                               use_depth_scaling)
    plans = []
    for li, uv in enumerate(batch.uv):
        per_layer = []
        for (h, w) in layer_sizes:
            if h % 8 or w % 128:
                per_layer.append(None)
            else:
                per_layer.append(plan_arrays_for_views(
                    np.asarray(uv), h, w,
                    weight_masks=None if wmasks is None else wmasks[li]))
        plans.append(tuple(per_layer))
    return batch._replace(splat_plans=tuple(plans))


def synthetic_view_batch(num_views=2, content_hw=(64, 85),
                         level_heights=(64, 96, 128), aspect=4.0 / 3.0,
                         min_depth=0.25, seed=0, valid_fraction=0.85,
                         jnp_arrays=True, depth_range=(0.5, 3.0)):
    """Build a ViewBatch for a camera panning across a textured plane.

    Each view v looks at a window of the unit UV square, slightly shifted per
    view; depth ramps across the image; the viewing angle falls off toward
    the image borders (grazing angles at the edges).
    """
    rng = np.random.default_rng(seed)
    h, w = content_hw
    levels = np.asarray(level_heights, dtype=np.float64)

    rgb = rng.random((num_views, h, w, 3), dtype=np.float32)
    # Gatys range
    rgb = (rgb[..., ::-1] - np.float32(0.45)) * np.float32(255.0)

    uv_pyramid = []
    for lh in level_heights:
        lw = int(lh * aspect)
        ys, xs = np.meshgrid(np.linspace(0, 1, lh), np.linspace(0, 1, lw),
                             indexing="ij")
        grids = []
        for v in range(num_views):
            shift = 0.1 * v / max(num_views, 1)
            u = 0.1 + 0.6 * xs + shift
            vv = 0.15 + 0.6 * ys
            g = np.stack([u * 2 - 1, vv * 2 - 1], axis=-1).astype(np.float32)
            grids.append(g)
        uv_pyramid.append(np.stack(grids, axis=0))

    # depth ramp per view (front-left near, back-right far)
    d0, d1 = depth_range
    ys, xs = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    depth = (d0 + (d1 - d0) * (0.3 * xs + 0.7 * ys))[None].repeat(num_views, 0)
    depth = depth.astype(np.float32)[..., None]

    # viewing angle: near-frontal at center, grazing at borders
    r = np.sqrt((xs - 0.5) ** 2 + (ys - 0.5) ** 2) / np.sqrt(0.5)
    cos_angle = np.clip(1.0 - 0.9 * r, 0.01, 1.0)
    angle_guidance = cos_angle[None, ..., None].repeat(num_views, 0).astype(np.float32)
    angle_degrees = np.degrees(np.arccos(angle_guidance)).astype(np.float32)

    # mask: a valid blob + invalid border strip
    mask = np.ones((num_views, h, w, 1), dtype=np.float32)
    strip = max(1, int(h * (1 - valid_fraction)))
    mask[:, :strip] = 0.0
    mask[:, :, :strip] = 0.0

    cont, rounded, other, weight = calculate_depth_level(
        depth[..., 0], levels, min_depth=min_depth)

    extr = np.tile(np.eye(4, dtype=np.float32), (num_views, 1, 1))
    intr = np.tile(np.eye(4, dtype=np.float32), (num_views, 1, 1))
    intr[:, 0, 0] = intr[:, 1, 1] = w
    intr[:, 0, 2] = w / 2.0
    intr[:, 1, 2] = h / 2.0

    batch = ViewBatch(
        rgb=rgb,
        uv=tuple(uv_pyramid),
        mask=mask,
        depth=depth,
        rounded_depth_level=rounded[..., None].astype(np.float32),
        other_depth_level=other[..., None].astype(np.float32),
        depth_level_weight=weight[..., None],
        angle_guidance=angle_guidance,
        angle_degrees=angle_degrees,
        extrinsics=extr,
        intrinsics=intr,
        idx=np.arange(num_views, dtype=np.int32),
        depth_level=cont[..., None],
    )
    if jnp_arrays:
        import jax.numpy as jnp

        batch = ViewBatch(*[
            tuple(jnp.asarray(x) for x in f) if isinstance(f, tuple)
            else (jnp.asarray(f) if f is not None else None)
            for f in batch
        ])
    return batch
