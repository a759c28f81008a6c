"""Multi-style sweeps: optimize one texture per style, one style per chip.

The reference styles a scene with many style images by re-running the whole
pipeline per style (the 120styles set). TPU-native: S independent texture
optimizations run in one jitted step — textures and style-Gram targets carry
a leading style axis sharded across the mesh, the view batch (and the shared
UV cache) is replicated, and there is NO gradient traffic between chips
(embarrassingly parallel; across pod slices this axis rides DCN).

``gram_mode='average'`` is not supported here (its rolling cache is
per-style state; use the default 'current').
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from stylemesh_tpu.models.pipeline import PipelineConfig, TexturePipeline
from stylemesh_tpu.models.texture import Texture, clamp_texture
from stylemesh_tpu.parallel.mesh import make_mesh, replicate_sharding


class MultiStyleState(NamedTuple):
    textures: Texture  # every layer has a leading style axis [S, h, w, 3]
    opt_state: object
    step: jax.Array


class MultiStylePipeline:
    """S styles, S textures, one shared scene; style axis over the mesh."""

    def __init__(self, config: PipelineConfig, vgg_params, style_images,
                 mesh=None, axis_name="style"):
        assert config.gram_mode == "current", \
            "multi-style sweeps require gram_mode='current'"
        self.config = config
        self.axis_name = axis_name
        if mesh is None:
            # style axis must divide the mesh: use the largest device count
            # that divides the number of styles
            devices = jax.devices()
            d = len(devices)
            while d > 1 and len(style_images) % d != 0:
                d -= 1
            mesh = make_mesh(devices[:d], axis_name=axis_name)
        self.mesh = mesh
        # base pipeline provides loss_with_targets and the optimizer recipe
        self.base = TexturePipeline(config, vgg_params, style_images[0])
        # stack per-style gram targets: [S, L, C, C] per layer
        targets = [self.base.loss.set_style_image(vgg_params, s)
                   for s in style_images]
        self.style_targets = jax.tree.map(
            lambda *xs: jnp.stack(xs), *targets)
        self.num_styles = len(style_images)
        self.optimizer = self.base.optimizer
        self._jit_step = None

    def init(self) -> MultiStyleState:
        cfg = self.config
        single = Texture.create(cfg.texture_width, cfg.texture_height, 3,
                                num_layers=cfg.hierarchical_layers,
                                random_init=cfg.random_texture_init)
        textures = Texture(layers=tuple(
            jnp.broadcast_to(l, (self.num_styles,) + l.shape)
            for l in single.layers))
        state = MultiStyleState(
            textures=textures,
            opt_state=self.optimizer.init(textures),
            step=jnp.zeros((), jnp.int32),
        )
        style_sh = NamedSharding(self.mesh, P(self.axis_name))
        rep = replicate_sharding(self.mesh)

        def shard_for(x):
            # style-sharded iff the leaf carries the style axis (adam's step
            # counter and other scalars stay replicated)
            if getattr(x, "ndim", 0) >= 1 and x.shape[0] == self.num_styles:
                return style_sh
            return rep

        return jax.device_put(state, jax.tree.map(shard_for, state))

    def _step(self, state: MultiStyleState, batch, aux):
        def one_style_loss(texture, targets):
            total, (losses, _) = self.base.loss_with_targets(
                texture, targets, batch, None, aux)
            return total, losses

        def total_loss(textures):
            (totals, losses) = jax.vmap(
                one_style_loss, in_axes=(0, 0))(textures, self.style_targets)
            return jnp.sum(totals), losses

        (_, losses), grads = jax.value_and_grad(
            total_loss, has_aux=True)(state.textures)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.textures)
        textures = optax.apply_updates(state.textures, updates)
        textures = clamp_texture(textures)
        return MultiStyleState(textures=textures, opt_state=opt_state,
                               step=state.step + 1), losses

    def train_step(self, state, batch, aux=None):
        """One step of all S optimizations (batch replicated, styles sharded).
        The per-style loss dict has a leading style axis. ``aux`` is the
        style-independent batch precompute (base.prepare_batch) — pass it
        when the batch repeats across steps."""
        assert batch.splat_plans is None, \
            "multi-style sweeps use the XLA scatter path (planned splats are "\
            "not vmappable yet)"
        if self._jit_step is None:
            rep = replicate_sharding(self.mesh)
            batch = jax.device_put(batch, jax.tree.map(lambda _: rep, batch))
            self._jit_step = jax.jit(self._step)
        return self._jit_step(state, batch, aux)
