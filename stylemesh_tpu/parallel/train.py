"""View-parallel training over a device mesh.

One jitted train step where the view batch is sharded across chips and the
texture (plus optimizer state) is replicated; XLA derives the gradient
all-reduce over ICI from the sharding annotations. This is the TPU-native
equivalent the reference never had (it steps one view at a time on one GPU,
SURVEY.md §2.6).
"""

import jax

from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline, TrainState
from stylemesh_tpu.parallel.mesh import (
    make_mesh,
    replicate_sharding,
    shard_view_batch,
    view_batch_sharding,
)


class ShardedTexturePipeline(TexturePipeline):
    """TexturePipeline whose train step runs view-data-parallel on a mesh.

    The loss already averages over views, so sharding the batch's leading
    axis makes each chip compute its local mean; the texture gradient psum /
    rescale is inserted by the partitioner.
    """

    def __init__(self, config: PipelineConfig, vgg_params, style_image,
                 mesh=None, axis_name="views"):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = axis_name
        super().__init__(config, vgg_params, style_image)
        self._sharded_step = None  # built lazily (needs batch structure)

    def init(self, rng=None) -> TrainState:
        state = super().init(rng)
        rep = replicate_sharding(self.mesh)
        return jax.device_put(state, jax.tree.map(lambda _: rep, state))

    def _build_sharded_step(self, batch):
        batch_sh = view_batch_sharding(batch, self.mesh, self.axis_name)
        self._sharded_step = jax.jit(
            self._train_step,
            in_shardings=(None, batch_sh, None),
            out_shardings=(None, None),
        )

    def prepare_batch(self, batch):
        """Batch-constant precompute on the sharded batch (each chip prepares
        its own views; results stay sharded for the step)."""
        batch = shard_view_batch(batch, self.mesh, self.axis_name)
        return self._jit_prepare_batch(batch)

    def train_step(self, state: TrainState, batch, aux=None):
        """One view-parallel step. ``batch.num_views`` must be divisible by
        the mesh size. The batch may be host numpy; it is placed sharded."""
        batch = shard_view_batch(batch, self.mesh, self.axis_name)
        if self._sharded_step is None:
            self._build_sharded_step(batch)
        return self._sharded_step(state, batch, aux)
