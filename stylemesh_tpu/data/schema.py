"""The per-view training batch schema.

The reference's dataset ``__getitem__`` emits a 13-tuple per view
(/root/reference/data/abstract_dataset.py:329-342). Here the same content is
a typed pytree with a leading view-batch dimension V — the axis the TPU
rebuild shards across chips (the reference iterates views one at a time).

All images are channel-last. The UV pyramid is a tuple because levels have
different (static) resolutions.
"""

from typing import NamedTuple, Optional, Tuple

import jax


class ViewBatch(NamedTuple):
    """A batch of V posed views of one scene.

    Shapes (H, W = content resolution, e.g. 256 x 341; H_i, W_i = UV pyramid
    level resolutions, e.g. heights 256..960):

    - ``rgb``: ``[V, H, W, 3]`` Gatys-preprocessed photo (content target).
    - ``uv``: per level ``[V, H_i, W_i, 2]`` sampling grid, (x, y) in [-1, 1]
      (align_corners=True convention, from the baked UV maps).
    - ``mask``: ``[V, H, W, 1]`` float 0/1 — valid UV and valid depth.
    - ``depth``: ``[V, H, W, 1]`` metric depth.
    - ``rounded_depth_level`` / ``other_depth_level``: ``[V, H, W, 1]``
      nearest / second-nearest pyramid level index per pixel (float-valued
      integers, see reference scannet_dataset.py:330-366).
    - ``depth_level_weight``: ``[V, H, W, 1]`` interpolation weight toward the
      nearest level.
    - ``angle_guidance``: ``[V, H, W, 1]`` cos(viewing angle) in [0, 1].
    - ``angle_degrees``: ``[V, H, W, 1]`` viewing angle in degrees.
    - ``extrinsics`` / ``intrinsics``: ``[V, 4, 4]`` camera matrices.
    - ``idx``: ``[V]`` int32 dataset indices.
    - ``depth_level``: optional ``[V, H, W, 1]`` continuous level (logging).
    """

    rgb: jax.Array
    uv: Tuple[jax.Array, ...]
    mask: jax.Array
    depth: jax.Array
    rounded_depth_level: jax.Array
    other_depth_level: jax.Array
    depth_level_weight: jax.Array
    angle_guidance: jax.Array
    angle_degrees: jax.Array
    extrinsics: jax.Array
    intrinsics: jax.Array
    idx: jax.Array
    depth_level: Optional[jax.Array] = None
    # Optional Pallas fast-path splat plans: tuple over pyramid levels of
    # tuples over texture layers of PlanArrays (see ops/splat_plan.py).
    splat_plans: Optional[Tuple] = None

    @property
    def num_views(self):
        return self.rgb.shape[0]

    @property
    def num_levels(self):
        return len(self.uv)
