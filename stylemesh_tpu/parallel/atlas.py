"""Atlas-sharded training: the texture atlas spatially partitioned across
chips (SURVEY.md §2.6's third TPU-native axis).

Each chip owns a row band of every texture layer ``[H/D, W, 3]`` plus the
matching Adam moments; the view batch and loss compute are replicated. The
banded splat plans (:func:`stylemesh_tpu.ops.splat_plan.plan_arrays_banded`)
confine every gather/splat window to one band, so:

- forward: each chip gathers its band's windows, the partial per-pixel
  pyramids are ``psum``'d over ICI (tens of MB per step — cheap on ICI);
- backward: each chip splats the replicated pixel cotangents into its own
  band — texture gradients never cross chips (no all-reduce of the 201MB
  atlas grad, the win over replicated view-DP);
- cross-band bilinear footprints ride the planner's secondary-window /
  residual machinery instead of halo exchanges (residual entries are routed
  to the band owning their texel at plan time).

Use when the texture state dominates HBM: a 4096² x 4-layer atlas plus Adam
is ~1.1GB replicated; banded over 8 chips it is ~134MB/chip, freeing room
for bigger view batches or 8k/16k atlases that cannot fit one chip at all.
"""

import dataclasses

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stylemesh_tpu.data.schema import ViewBatch
from stylemesh_tpu.models.pipeline import (
    BatchAux,
    PipelineConfig,
    TexturePipeline,
    TrainState,
    _grad_scale,
)
from stylemesh_tpu.models.texture import Texture, clamp_texture
from stylemesh_tpu.ops.grid_sample import grid_sample, grid_sample_banded_cf
from stylemesh_tpu.parallel.mesh import make_mesh


def with_banded_splat_plans(batch: ViewBatch, layer_sizes, n_bands,
                            use_angle_weight=False, use_depth_scaling=False):
    """Attach banded plans (leading band axis) for every texture layer."""
    import numpy as np

    from stylemesh_tpu.data.grad_masks import grad_weight_masks
    from stylemesh_tpu.ops.splat_plan import plan_arrays_banded

    level_shapes = [tuple(u.shape[1:3]) for u in batch.uv]
    wmasks = grad_weight_masks(batch, level_shapes, use_angle_weight,
                               use_depth_scaling)
    plans = []
    for li, uv in enumerate(batch.uv):
        per_layer = []
        for (h, w) in layer_sizes:
            if h % 8 or w % 128 or h % n_bands or (h // n_bands) % 8:
                per_layer.append(None)
            else:
                per_layer.append(plan_arrays_banded(
                    np.asarray(uv), h, w, n_bands,
                    weight_masks=None if wmasks is None else wmasks[li]))
        plans.append(tuple(per_layer))
    return batch._replace(splat_plans=tuple(plans))


class AtlasShardedPipeline(TexturePipeline):
    """TexturePipeline whose texture/optimizer state is row-banded over the
    mesh; loss math is identical to the single-chip step."""

    def __init__(self, config: PipelineConfig, vgg_params, style_image,
                 mesh=None, axis_name="atlas"):
        assert config.gram_mode == "current", (
            "atlas-sharded training supports gram_mode='current' only")
        self.mesh = mesh if mesh is not None else make_mesh(
            axis_name=axis_name)
        self.axis_name = axis_name
        d = self.mesh.size
        assert config.texture_height % d == 0, (config.texture_height, d)
        super().__init__(config, vgg_params, style_image)
        self._sharded_step = None
        self._sharded_eval = None

    # ------------------------------------------------------------ sharding

    def _band_spec(self, x):
        # texture layers (and their Adam moments) are [h, w, 3]; everything
        # smaller (step counter, schedule count) stays replicated
        if getattr(x, "ndim", 0) >= 3:
            return P(self.axis_name)
        return P()

    def init(self, rng=None) -> TrainState:
        state = super().init(rng)
        shardings = jax.tree.map(
            lambda x: NamedSharding(self.mesh, self._band_spec(x)), state)
        return jax.device_put(state, shardings)

    # ----------------------------------------------- per-band loss pieces

    def _render_pyramid(self, texture: Texture, batch: ViewBatch):
        """Runs inside shard_map with band-local texture layers and the
        band's plan slices."""
        cfg = self.config
        skip = set(cfg.skip_levels)
        out = []
        for i, (uv, plans) in enumerate(zip(batch.uv, batch.splat_plans or
                                            [None] * len(batch.uv))):
            if i in skip:  # statically-empty level (see TexturePipeline)
                out.append(None)
                continue
            acc = None
            for li, layer_band in enumerate(texture.layers):
                plan = None if plans is None else plans[li]
                if plan is not None and cfg.use_splat_kernel:
                    y = grid_sample_banded_cf(
                        layer_band.transpose(2, 0, 1), uv, plan,
                        self.axis_name, cfg.kernel_compute)
                else:
                    # plan-ineligible layer: reassemble it on every chip
                    # (all_gather fwd / reduce_scatter bwd). The loss is
                    # REPLICATED across the atlas axis, so the reduce-scatter
                    # of the backward sums D identical cotangent copies — the
                    # 1/D gradient rescale (value-exact) cancels that.
                    # Verified vs the single-device gradient in
                    # tests/test_parallel.py::test_atlas_fallback_layer_grad.
                    full = jax.lax.all_gather(layer_band, self.axis_name,
                                              axis=0, tiled=True)
                    full = _grad_scale(full, 1.0 / self.mesh.size)
                    y = grid_sample(full, uv)
                acc = y if acc is None else acc + y
            out.append(acc)
        return out

    def _tex_reg(self, texture: Texture):
        """Global mean-square over the banded layers: local sums psum'd,
        divided by the FULL layer sizes (gradient scale must match the
        single-chip mean)."""
        d = self.mesh.size
        reg = 0.0
        for w, layer in zip(self.resolved_reg_weights, texture.layers):
            local = jnp.sum(jnp.square(layer.astype(jnp.float32)))
            total = jax.lax.psum(local, self.axis_name)
            # under check_vma=False the psum transpose sums the D identical
            # (replicated-loss) cotangents — rescale the gradient by 1/D so
            # each band sees the true dL/dband (value unchanged)
            total = _grad_scale(total, 1.0 / d)
            reg = reg + total / (layer.size * d) * w
        return reg

    # --------------------------------------------------------------- steps

    def _local_train_step(self, state, batch, aux):
        # texture params are disjoint per chip: no gradient reduction at all
        batch = batch._replace(splat_plans=jax.tree.map(
            lambda a: jnp.squeeze(a, 0), batch.splat_plans))
        (_, (losses, new_cache)), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.texture, batch,
                                        state.gram_cache, aux)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.texture)
        texture = clamp_texture(optax.apply_updates(state.texture, updates))
        return TrainState(texture=texture, opt_state=opt_state,
                          step=state.step + 1, gram_cache=new_cache), losses

    def _build_sharded_step(self, state, batch, aux):
        state_specs = jax.tree.map(self._band_spec, state)
        batch_specs = jax.tree.map(lambda _: P(), batch)._replace(
            splat_plans=jax.tree.map(lambda _: P(self.axis_name),
                                     batch.splat_plans))
        smapped = jax.shard_map(
            self._local_train_step, mesh=self.mesh, check_vma=False,
            in_specs=(state_specs, batch_specs,
                      jax.tree.map(lambda _: P(), aux)),
            out_specs=(state_specs, P()))
        self._sharded_step = jax.jit(smapped, donate_argnums=(0,))

    def train_step(self, state: TrainState, batch, aux=None):
        assert batch.splat_plans is not None, (
            "atlas-sharded training needs banded plans "
            "(with_banded_splat_plans)")
        if aux is None:
            aux = self.prepare_batch(batch)
        if self._sharded_step is None:
            self._build_sharded_step(state, batch, aux)
        return self._sharded_step(state, batch, aux)

    def _local_eval(self, state, batch, aux):
        batch = batch._replace(splat_plans=jax.tree.map(
            lambda a: jnp.squeeze(a, 0), batch.splat_plans))
        _, (losses, _) = self.loss_fn(state.texture, batch,
                                      state.gram_cache, aux)
        return losses

    def eval_step(self, state: TrainState, batch, aux=None):
        """Validation losses with the banded texture/plans (no update)."""
        assert batch.splat_plans is not None
        if aux is None:
            aux = self.prepare_batch(batch)
        if self._sharded_eval is None:
            state_specs = jax.tree.map(self._band_spec, state)
            batch_specs = jax.tree.map(lambda _: P(), batch)._replace(
                splat_plans=jax.tree.map(lambda _: P(self.axis_name),
                                         batch.splat_plans))
            smapped = jax.shard_map(
                self._local_eval, mesh=self.mesh, check_vma=False,
                in_specs=(state_specs, batch_specs,
                          jax.tree.map(lambda _: P(), aux)),
                out_specs=P())
            self._sharded_eval = jax.jit(smapped)
        return self._sharded_eval(state, batch, aux)
