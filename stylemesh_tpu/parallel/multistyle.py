"""Multi-style sweeps: optimize one texture per style, one style per chip.

The reference styles a scene with many style images by re-running the whole
pipeline per style (the 120styles set). TPU-native: S independent texture
optimizations run in one jitted step — textures, optimizer moments and
style-Gram targets carry a leading style axis sharded across the mesh, the
view batch (and the shared UV cache + Pallas splat plans, which are
style-invariant) is replicated, and there is NO gradient traffic between
chips (embarrassingly parallel; across pod slices this axis rides DCN).

The step body is a ``shard_map`` over the style axis: each chip loops over
its local styles (usually one) and runs the full planned pipeline per style,
so the Pallas gather/splat kernels work unchanged — no vmap batching rule
needed.

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
        assert self.num_styles % self.mesh.size == 0, (
            self.num_styles, self.mesh.size)
        self.optimizer = self.base.optimizer
        self._jit_step = None
        self._jit_eval = None

    def prepare_batch(self, batch):
        """Style-independent batch precompute (shared by all styles)."""
        return self.base.prepare_batch(batch)

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
        return jax.device_put(state, self._state_shardings(state))

    def _style_spec(self, x):
        # style-sharded iff the leaf carries the style axis (adam's step
        # counter and other scalars stay replicated)
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] == self.num_styles:
            return P(self.axis_name)
        return P()

    def _state_shardings(self, state):
        return jax.tree.map(
            lambda x: NamedSharding(self.mesh, self._style_spec(x)), state)

    def _local_step(self, state: MultiStyleState, targets, batch, aux):
        """Per-chip: loop the chip's local styles, full planned pipeline
        each; no collectives (styles are independent)."""
        s_local = state.textures.layers[0].shape[0]

        def loss_of(textures):
            totals, losses = [], []
            for s in range(s_local):
                tex_s = Texture(layers=tuple(l[s] for l in textures.layers))
                tgt_s = jax.tree.map(lambda x: x[s], targets)
                total, (ls, _) = self.base.loss_with_targets(
                    tex_s, tgt_s, batch, None, aux)
                totals.append(total)
                losses.append(ls)
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *losses)
            return jnp.sum(jnp.stack(totals)), stacked

        (_, losses), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.textures)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.textures)
        textures = clamp_texture(optax.apply_updates(state.textures, updates))
        return MultiStyleState(textures=textures, opt_state=opt_state,
                               step=state.step + 1), losses

    def _build_step(self, state, batch, aux):
        state_specs = jax.tree.map(self._style_spec, state)
        target_specs = jax.tree.map(lambda _: P(self.axis_name),
                                    self.style_targets)
        rep = lambda t: jax.tree.map(lambda _: P(), t)
        smapped = jax.shard_map(
            self._local_step, mesh=self.mesh, check_vma=False,
            in_specs=(state_specs, target_specs, rep(batch), rep(aux)),
            out_specs=(state_specs, P(self.axis_name)))
        self._jit_step = jax.jit(smapped, donate_argnums=(0,))

    def train_step(self, state, batch, aux=None):
        """One step of all S optimizations (batch replicated, styles
        sharded). The per-style loss dict has a leading style axis. ``aux``
        is the style-independent batch precompute (prepare_batch) — pass it
        when the batch repeats across steps."""
        rep = replicate_sharding(self.mesh)
        batch = jax.device_put(batch, jax.tree.map(lambda _: rep, batch))
        if aux is None:
            aux = self.prepare_batch(batch)
        if self._jit_step is None:
            self._build_step(state, batch, aux)
        return self._jit_step(state, self.style_targets, batch, aux)

    def _local_eval(self, state: MultiStyleState, targets, batch, aux):
        s_local = state.textures.layers[0].shape[0]
        losses = []
        for s in range(s_local):
            tex_s = Texture(layers=tuple(l[s] for l in state.textures.layers))
            tgt_s = jax.tree.map(lambda x: x[s], targets)
            _, (ls, _) = self.base.loss_with_targets(
                tex_s, tgt_s, batch, None, aux)
            losses.append(ls)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *losses)

    def eval_step(self, state, batch, aux=None):
        """Per-style validation losses without an update (leading style
        axis, like train_step's loss dict)."""
        rep = replicate_sharding(self.mesh)
        batch = jax.device_put(batch, jax.tree.map(lambda _: rep, batch))
        if aux is None:
            aux = self.prepare_batch(batch)
        if self._jit_eval is None:
            state_specs = jax.tree.map(self._style_spec, state)
            target_specs = jax.tree.map(lambda _: P(self.axis_name),
                                        self.style_targets)
            rep_spec = lambda t: jax.tree.map(lambda _: P(), t)
            smapped = jax.shard_map(
                self._local_eval, mesh=self.mesh, check_vma=False,
                in_specs=(state_specs, target_specs, rep_spec(batch),
                          rep_spec(aux)),
                out_specs=P(self.axis_name))
            self._jit_eval = jax.jit(smapped)
        return self._jit_eval(state, self.style_targets, batch, aux)

    def texture_for_style(self, state: MultiStyleState, s: int) -> Texture:
        """Materialize style ``s``'s texture as a plain (unsharded) Texture
        for export / post-train rendering."""
        return texture_for_style(state, s)


def texture_for_style(state: MultiStyleState, s: int) -> Texture:
    """Style ``s``'s texture pulled to host as a plain Texture."""
    return Texture(layers=tuple(
        jnp.asarray(jax.device_get(l[s])) for l in state.textures.layers))
