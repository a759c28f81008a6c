"""View-parallel training over a device mesh.

One jitted train step where the view batch is sharded across chips and the
texture (plus optimizer state) is replicated. The step body is an explicit
``shard_map`` — each chip runs the full local pipeline (Pallas gather/splat
kernels included, on its own view slice and plan-schedule slice) and the
texture gradient is ``pmean``-reduced over ICI. This is the TPU-native
equivalent the reference never had (it steps one view at a time on one GPU,
SURVEY.md §2.6).

shard_map (not automatic jit partitioning) is load-bearing here: the Pallas
window kernels have no SPMD partitioning rule, so under automatic
partitioning XLA would have to all-gather their operands per call. Inside
shard_map each chip sees only its local [V/D, ...] arrays — the splat plans
are laid out [V, n] precisely so they slice along views.
"""

import functools

import jax
from jax.sharding import PartitionSpec as P

from stylemesh_tpu.models.pipeline import (
    BatchAux,
    PipelineConfig,
    TexturePipeline,
    TrainState,
)
from stylemesh_tpu.parallel.mesh import (
    make_mesh,
    replicate_sharding,
    shard_view_batch,
)


class ShardedTexturePipeline(TexturePipeline):
    """TexturePipeline whose train step runs view-data-parallel on a mesh.

    The loss already averages over views, so each chip computes the mean
    over its local views and gradients/losses are pmean'd — identical math
    to the single-chip step at any mesh size (equal shard sizes required:
    ``batch.num_views`` divisible by the mesh size).
    """

    def __init__(self, config: PipelineConfig, vgg_params, style_image,
                 mesh=None, axis_name="views", style_targets=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = axis_name
        super().__init__(config, vgg_params, style_image,
                         style_targets=style_targets)
        if config.gram_mode == "average":
            # gram_mode='average' (the reference's dip preset) under
            # view-DP: each chip runs the exact sequential walk over its
            # LOCAL views, then the per-view pushed grams are all-gathered
            # and folded into the pre-step cache in global (chip, view)
            # order — see _merge_gram_pushes for the exact-vs-stale
            # semantics. The loss must log its pushes for that.
            import dataclasses

            self.loss = dataclasses.replace(self.loss, collect_push_log=True)
        self._sharded_step = None  # built lazily (needs batch structure)
        self._sharded_eval = None

    def init(self, rng=None) -> TrainState:
        state = super().init(rng)
        rep = replicate_sharding(self.mesh)
        return jax.device_put(state, jax.tree.map(lambda _: rep, state))

    # --------------------------------------------------------- shard_map body

    def _merge_gram_pushes(self, pre_cache, local_cache):
        """Deterministic cross-chip gram-cache update for gram_mode='average'.

        The walk's pushes are detached per-view grams that do NOT depend on
        the walk order (losses.py pushes ``stop_gradient(cur)``, the raw
        per-view gram), so folding every chip's pushes into the PRE-step
        cache in (chip, view, level) order — which with contiguous view
        shards IS the original view order — reproduces the single-chip
        sequential cache BIT-EXACTLY. The only deviation from the reference
        (content_and_style_losses.py:319-323) is in the *mixing* each view
        saw during the step: a view mixes against the shared history plus
        earlier LOCAL pushes only; same-step pushes from other chips land
        one step late. With the 10-deep cache and the reference's
        index_repeat>=4 repeat sampling this staleness is one batch out of
        >=40 cache entries' worth of history (documented in PARITY.md).
        """
        import jax.numpy as jnp

        from stylemesh_tpu.models.losses import GRAM_CACHE_DEPTH, GramCache

        pushes, flags = local_cache.push_log
        flags_g = jax.lax.all_gather(flags, self.axis_name).reshape(-1)

        def fold_layer(cache_k, pushes_k):
            pg = jax.lax.all_gather(pushes_k, self.axis_name)
            pg = pg.reshape((-1,) + pushes_k.shape[1:])

            def body(c, xs):
                g, f = xs
                pushed = jnp.roll(c, 1, axis=0).at[0].set(g)
                return jnp.where(f, pushed, c), None

            out, _ = jax.lax.scan(body, cache_k, (pg, flags_g))
            return out

        grams = {k: fold_layer(pre_cache.grams[k], pushes[k]) for k in pushes}
        count = jnp.minimum(
            pre_cache.count + jnp.sum(flags_g.astype(jnp.int32)),
            GRAM_CACHE_DEPTH)
        return GramCache(grams=grams, count=count)

    def _local_train_step(self, state, batch, aux):
        """Runs per chip on the local view slice; grads reduced over ICI."""
        import optax

        from stylemesh_tpu.models.pipeline import clamp_texture

        (_, (losses, new_cache)), grads = jax.value_and_grad(
            self.loss_fn, has_aux=True)(state.texture, batch,
                                        state.gram_cache, aux)
        if new_cache is not None and new_cache.push_log is not None:
            new_cache = self._merge_gram_pushes(state.gram_cache, new_cache)
        grads = jax.lax.pmean(grads, self.axis_name)
        losses = jax.lax.pmean(losses, self.axis_name)
        updates, opt_state = self.optimizer.update(grads, state.opt_state,
                                                   state.texture)
        texture = clamp_texture(optax.apply_updates(state.texture, updates))
        return TrainState(texture=texture, opt_state=opt_state,
                          step=state.step + 1, gram_cache=new_cache), losses

    def _local_eval_step(self, state, batch, aux):
        _, (losses, _) = self.loss_fn(state.texture, batch,
                                      state.gram_cache, aux)
        return jax.lax.pmean(losses, self.axis_name)

    def _specs(self, tree_):
        return jax.tree.map(lambda _: P(self.axis_name), tree_)

    def _build_sharded_step(self, batch, aux):
        smapped = jax.shard_map(
            self._local_train_step, mesh=self.mesh, check_vma=False,
            in_specs=(P(), self._specs(batch), self._specs(aux)),
            out_specs=(P(), P()))
        self._sharded_step = jax.jit(smapped, donate_argnums=(0,))

    def _build_sharded_eval(self, batch, aux):
        smapped = jax.shard_map(
            self._local_eval_step, mesh=self.mesh, check_vma=False,
            in_specs=(P(), self._specs(batch), self._specs(aux)),
            out_specs=P())
        self._sharded_eval = jax.jit(smapped)

    # --------------------------------------------------------------- public

    def prepare_batch(self, batch) -> BatchAux:
        """Batch-constant precompute on the sharded batch (each chip prepares
        its own views; results stay view-sharded for the step)."""
        batch = shard_view_batch(batch, self.mesh, self.axis_name)
        smapped = jax.shard_map(
            self._prepare_batch, mesh=self.mesh, check_vma=False,
            in_specs=(self._specs(batch),),
            out_specs=jax.tree.map(lambda _: P(self.axis_name),
                                   jax.eval_shape(self._prepare_batch, batch)))
        return jax.jit(smapped)(batch)

    def train_step(self, state: TrainState, batch, aux=None):
        """One view-parallel step. ``batch.num_views`` must be divisible by
        the mesh size. The batch may be host numpy; it is placed sharded."""
        assert batch.num_views % self.mesh.size == 0, (
            batch.num_views, self.mesh.size)
        batch = shard_view_batch(batch, self.mesh, self.axis_name)
        if aux is None:
            aux = self.prepare_batch(batch)
        if self._sharded_step is None:
            self._build_sharded_step(batch, aux)
        return self._sharded_step(state, batch, aux)

    def eval_step(self, state: TrainState, batch, aux=None):
        batch = shard_view_batch(batch, self.mesh, self.axis_name)
        if aux is None:
            aux = self.prepare_batch(batch)
        if self._sharded_eval is None:
            self._build_sharded_eval(batch, aux)
        return self._sharded_eval(state, batch, aux)
