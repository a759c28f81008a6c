"""Content + style losses over a multi-resolution prediction pyramid.

Re-implements ``ContentAndStyleLoss`` and ``calculate_pyramid``
(/root/reference/model/losses/content_and_style_losses.py:146-350) as pure,
static-shape JAX functions:

- Variable-length masked feature sets become mask-weighted Grams / MSEs
  (bit-equal to the gather form, see :mod:`stylemesh_tpu.ops.gram`).
- The reference's dynamic "drop empty pyramid levels"
  (/root/reference/model/model.py:256-257) becomes zero-factor levels — an
  empty mask yields factor 0 and zero masked losses, so the contribution is
  identical without shape changes.
- Batching: the reference runs one view per step (batch_size=1). Here a batch
  of V views computes per-view masks/factors/losses (each exactly the
  reference's B=1 semantics) and returns the mean over views — the natural
  many-views-per-step generalization for a TPU view-parallel step.
- ``gram_mode='average'`` (rolling cache of the last 10 Grams, 9 detached,
  :319-323) becomes explicit functional state (:class:`GramCache`) carried in
  the train state. The cache walk is exact for any V: views are processed in
  a view-outer sequential walk so view ``vi`` mixes against a history that
  includes the pushes of earlier views in the same batch — identical to V
  consecutive reference steps (gated by ``tests/test_losses.py``).

Style targets are computed once per style image and folded as constants into
the jitted step (:273-286 in the reference).
"""

import dataclasses
import os
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from stylemesh_tpu.models.vgg import vgg_features
from stylemesh_tpu.ops.gram import gram_matrix, masked_gram, masked_mse
from stylemesh_tpu.ops import gram_pallas
from stylemesh_tpu.ops.pyramid import image_pyramid
from stylemesh_tpu.ops.resize import resize_bilinear, resize_nearest

DEFAULT_STYLE_LAYERS = ("r11", "r21", "r31", "r41", "r51")
DEFAULT_CONTENT_LAYERS = ("r42",)
DEFAULT_STYLE_WEIGHTS = tuple(1e3 / n ** 2 for n in (64, 128, 256, 512, 512))
DEFAULT_CONTENT_WEIGHTS = (1.0,)

GRAM_CACHE_DEPTH = 10  # reference keeps the current + 9 detached grams (:320)


class StyleTargets(NamedTuple):
    """Precomputed style Gram targets: layer name -> ``[num_levels, C, C]``."""

    grams: Dict[str, jax.Array]


class GramCache(NamedTuple):
    """Functional state for ``gram_mode='average'``.

    ``grams[layer]``: ``[GRAM_CACHE_DEPTH, C, C]`` ring buffer (slot 0 is the
    most recent); ``count``: number of valid entries. ``push_log`` is only
    populated when ``ContentAndStyleLoss.collect_push_log`` is set (the
    view-data-parallel cache merge, parallel/train.py): a
    ``({layer: [P, C, C] detached grams}, [P] bool flags)`` record of the
    walk's pushes in (view-outer, level-inner) order. Never carried in
    TrainState — the consumers strip it.
    """

    grams: Dict[str, jax.Array]
    count: jax.Array  # scalar int32
    push_log: Optional[Tuple[Dict[str, jax.Array], jax.Array]] = None

    @staticmethod
    def create(style_layers, layer_channels):
        return GramCache(
            grams={k: jnp.zeros((GRAM_CACHE_DEPTH, layer_channels[k], layer_channels[k]),
                                dtype=jnp.float32) for k in style_layers},
            count=jnp.zeros((), dtype=jnp.int32),
        )


def _mse_gram(y, y_hat):
    """Per-view MSE between a target Gram ``[C, C]`` (broadcast) and per-view
    Grams ``[V, C, C]``. Returns ``[V]``."""
    d = (y_hat.astype(jnp.float32) - y.astype(jnp.float32)) ** 2
    return jnp.mean(d, axis=(-2, -1))


@dataclasses.dataclass(frozen=True)
class ContentAndStyleLoss:
    """Static configuration of the loss; all methods are pure."""

    style_layers: Tuple[str, ...] = DEFAULT_STYLE_LAYERS
    content_layers: Tuple[str, ...] = DEFAULT_CONTENT_LAYERS
    style_weights: Tuple[float, ...] = DEFAULT_STYLE_WEIGHTS
    content_weights: Tuple[float, ...] = DEFAULT_CONTENT_WEIGHTS
    angle_threshold: float = 60.0
    style_pyramid_mode: str = "single"  # 'single' | 'multi'
    gram_mode: str = "current"  # 'current' | 'average'
    pool: str = "max"
    num_style_levels: int = 5
    style_min_size: int = 256  # pyramid floor (reference image_pyramid default)
    remat: bool = True  # recompute VGG activations in backward (HBM headroom)
    # selective remat: only pyramid levels with >= this many pixels are
    # rematerialized (they dominate the activation memory); smaller levels
    # keep their activations and skip the recompute. 0 = remat every level.
    remat_min_px: int = 0
    compute_dtype: Optional[jnp.dtype] = None
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    # record the gram-average walk's pushes in GramCache.push_log (the
    # view-DP cross-chip cache merge needs them; see parallel/train.py)
    collect_push_log: bool = False
    # pyramid levels statically known to be empty for EVERY view of the
    # scene (whole-scene depth-level analysis in optimize.py): their VGG
    # encode and every gram/content term are skipped at trace time. The
    # reference equivalently drops empty levels each step
    # (model.py:256-257); the static skip also deletes the dead compute.
    skip_levels: Tuple[int, ...] = ()

    def __post_init__(self):
        assert self.style_pyramid_mode in ("single", "multi"), self.style_pyramid_mode
        assert self.gram_mode in ("current", "average"), self.gram_mode

    @property
    def layers(self):
        return tuple(self.style_layers) + tuple(self.content_layers)

    def _encode(self, vgg_params, x, keys):
        return vgg_features(vgg_params, x, keys, pool=self.pool,
                            compute_dtype=self.compute_dtype, precision=self.precision)

    # ------------------------------------------------------------- targets

    def set_style_image(self, vgg_params, style_image):
        """Precompute per-level style Gram targets (reference :273-286).

        The encode+gram runs under one jit per pyramid level: eagerly it is
        ~126 op-by-op dispatches (each a separate backend compile — on the
        remote-compile TPU tunnel that alone dominated pipeline build time);
        jitted it is num_style_levels disk-cached compiles.

        Args:
            style_image: ``[1, H, W, 3]`` Gatys-preprocessed.
        Returns:
            :class:`StyleTargets` with ``[num_levels, C, C]`` per style layer.
        """
        levels = list(range(self.num_style_levels))
        pyramid = image_pyramid(style_image, levels, reverse=True,
                                minimum_size=self.style_min_size)

        @jax.jit
        def encode_and_gram(params, p):
            encs = self._encode(params, p, self.style_layers)
            return {k: gram_matrix(encs[k])[0] for k in self.style_layers}

        per_level = [encode_and_gram(vgg_params, p) for p in pyramid]
        grams = {k: jnp.stack([g[k] for g in per_level], axis=0)
                 for k in self.style_layers}
        return StyleTargets(grams=grams)

    # ------------------------------------------------------------- forward

    @staticmethod
    def _layer_hw(name, hw):
        """Feature resolution of a named activation for an ``hw`` input:
        each of the preceding max-pools floors the size by 2 (and floor
        composes: floor(floor(h/2)/2) == floor(h/4))."""
        pools = int(name[1]) - (0 if name.startswith("p") else 1)
        return (hw[0] // 2 ** pools, hw[1] // 2 ** pools)

    def precompute_aux(self, vgg_params, level_shapes, target_content,
                       pyramid_masks, angle_degrees):
        """All texture-independent per-batch constants of the loss: the
        content-target VGG encodings and their per-level resizes, every
        mask resize, and the level factors (reference calculate_pyramid,
        content_and_style_losses.py:146-230).

        These depend only on the batch, so with the reference's repeat
        sampler (``--index_repeat`` 4..100) they amortize to ~zero — compute
        once per batch (``TexturePipeline.prepare_batch``) instead of every
        step.
        """
        num_levels = len(level_shapes)
        v = target_content.shape[0]
        all_layers = self.layers
        content_encs = self._encode(vgg_params, target_content,
                                    self.content_layers)
        # storage dtype for the big per-layer constants: masks are 0/1 (bf16
        # is exact for them); content targets follow the compute dtype (they
        # came out of bf16 VGG activations anyway when compute_dtype is set)
        store = self.compute_dtype or jnp.float32

        masks = [dict() for _ in range(num_levels)]
        masks_passed = [dict() for _ in range(num_levels)]
        masks_failed = [dict() for _ in range(num_levels)]
        content_targets = [dict() for _ in range(num_levels)]
        factors = [dict() for _ in range(num_levels)]
        # fused-gram constants (ops/gram_pallas.py): per style layer at a
        # large-enough resolution, the stacked mask variants in the kernel's
        # padded [K, V, P] layout + their pixel counts.
        gram_masks_t = [dict() for _ in range(num_levels)]
        gram_counts = [dict() for _ in range(num_levels)]
        use_fused = (self.compute_dtype == jnp.bfloat16
                     and os.environ.get("STYLEMESH_FAST_GRAM", "1") != "0")
        live = [i for i in range(num_levels) if i not in self.skip_levels]

        for i in live:
            mask = pyramid_masks[i].astype(jnp.float32)
            hw = tuple(mask.shape[1:3])
            passed = resize_bilinear(angle_degrees.astype(jnp.float32),
                                     hw) < self.angle_threshold
            passed = passed.astype(jnp.float32)
            by_hw = {}
            gm_by_hw = {}
            for k in all_layers:
                fhw = self._layer_hw(k, hw)
                if fhw not in by_hw:  # r41/r42 share a resolution
                    m = resize_nearest(mask, fhw)
                    by_hw[fhw] = (
                        m.astype(store),
                        resize_nearest(mask * passed, fhw).astype(store),
                        resize_nearest(mask * (1.0 - passed), fhw).astype(store),
                        jnp.mean(m.reshape(v, -1), axis=1),
                    )
                m, mp, mf, f = by_hw[fhw]
                masks[i][k] = m
                masks_passed[i][k] = mp
                masks_failed[i][k] = mf
                factors[i][k] = f  # [V]
                if k in self.content_layers:
                    content_targets[i][k] = resize_bilinear(
                        content_encs[k].astype(jnp.float32), fhw).astype(store)
                if (use_fused and k in self.style_layers
                        and fhw[0] * fhw[1] >= gram_pallas.MIN_PX):
                    if fhw not in gm_by_hw:
                        if self.style_pyramid_mode == "multi":
                            stack = jnp.stack([mp[..., 0], mf[..., 0]])
                        else:
                            stack = jnp.stack([m[..., 0]])
                        gm_by_hw[fhw] = (
                            gram_pallas.stack_masks(stack),
                            jnp.sum(stack.astype(jnp.float32)
                                    .reshape(stack.shape[0], v, -1), axis=2),
                        )
                    gram_masks_t[i][k], gram_counts[i][k] = gm_by_hw[fhw]

        # --- normalize factors across levels per layer (reference :199-204),
        # guarded against all-empty layers (reference would drop such batches).
        for k in all_layers:
            total = sum(factors[i][k] for i in live)
            safe = jnp.where(total > 0, total, 1.0)
            for i in live:
                factors[i][k] = jnp.where(total > 0, factors[i][k] / safe, 0.0)

        return dict(masks=masks, masks_passed=masks_passed,
                    masks_failed=masks_failed,
                    content_targets=content_targets, factors=factors,
                    gram_masks_t=gram_masks_t, gram_counts=gram_counts)

    def __call__(self, vgg_params, style_targets: StyleTargets,
                 pred_pyramid: Sequence[jax.Array], target_content: jax.Array,
                 pyramid_masks: Sequence[jax.Array], angle_degrees: jax.Array,
                 gram_cache: Optional[GramCache] = None, aux=None):
        """Compute (style_loss, content_loss, new_gram_cache).

        Args:
            pred_pyramid: per level ``[V, H_i, W_i, 3]`` sampled textures
                (Gatys space, grad-weighting already applied).
            target_content: ``[V, H, W, 3]`` Gatys-preprocessed photo.
            pyramid_masks: per level ``[V, H_i, W_i, 1]`` 0/1 float.
            angle_degrees: ``[V, H, W, 1]`` viewing angle in degrees.
            gram_cache: required iff ``gram_mode == 'average'``.
            aux: optional :meth:`precompute_aux` result (texture-independent
                batch constants); computed inline when absent.
        Returns:
            scalar style loss, scalar content loss (means over views), and the
            updated gram cache (input cache if mode is 'current').
        """
        num_levels = len(pred_pyramid)
        v = target_content.shape[0]
        all_layers = self.layers
        # statically-empty levels (``skip_levels``): the pipeline passes
        # ``None`` for their (unrendered) pyramid entries; every term they
        # would contribute is exactly zero, so they are skipped at trace time
        live = [i for i in range(num_levels)
                if i not in self.skip_levels and pred_pyramid[i] is not None]

        # the VGG activations of the prediction pyramid are the memory peak
        # of the step (up to 960px x 64ch per level x batch); remat recomputes
        # them in the backward for ~1/3 extra conv FLOPs. With remat_min_px
        # only the large levels (the actual memory peak) pay the recompute.
        encode = lambda x: self._encode(vgg_params, x, all_layers)
        encode_remat = jax.checkpoint(encode)

        def encode_level(p):
            if self.remat and p.shape[1] * p.shape[2] >= self.remat_min_px:
                return encode_remat(p)
            return encode(p)

        pred_encs = [encode_level(p) if i in live else None
                     for i, p in enumerate(pred_pyramid)]

        if aux is None:
            aux = self.precompute_aux(
                vgg_params,
                [None if p is None else p.shape[1:3] for p in pred_pyramid],
                target_content, pyramid_masks, angle_degrees)
        masks = aux["masks"]
        masks_passed = aux["masks_passed"]
        masks_failed = aux["masks_failed"]
        content_targets = aux["content_targets"]
        factors = aux["factors"]

        # --- per (level, layer) prediction Grams (batched over views).
        # Large layers go through the fused Pallas kernel (one feature read
        # for every mask variant, no F*m materializations — see
        # ops/gram_pallas.py); small layers keep the XLA einsum.
        gram_masks_t = aux.get("gram_masks_t") or [dict()] * num_levels
        gram_counts = aux.get("gram_counts") or [dict()] * num_levels
        interpret = jax.default_backend() == "cpu"
        y_hat_grams = []
        failed_grams = [dict() for _ in range(num_levels)]
        for i in range(num_levels):
            if i not in live:
                y_hat_grams.append(None)
                continue
            g = {}
            for k in self.style_layers:
                if k in gram_masks_t[i]:
                    sums = gram_pallas.fused_masked_grams(
                        pred_encs[i][k], gram_masks_t[i][k],
                        interpret)  # [V, K, C, C]
                    counts = gram_counts[i][k]  # [K, V]
                    denom = jnp.where(counts > 0, counts, 1.0)
                    if self.style_pyramid_mode == "multi":
                        g[k] = sums[:, 0] / denom[0][:, None, None]
                        failed_grams[i][k] = (
                            sums[:, 1] / denom[1][:, None, None])
                    else:
                        g[k] = sums[:, 0] / denom[0][:, None, None]
                else:
                    m = (masks_passed[i][k]
                         if self.style_pyramid_mode == "multi"
                         else masks[i][k])
                    g[k] = masked_gram(pred_encs[i][k], m)
            y_hat_grams.append(g)

        new_cache = gram_cache
        if self.gram_mode == "average":
            assert new_cache is not None, "gram_mode='average' needs a GramCache"
            # View-outer cache walk — exactly V sequential reference steps
            # (:319-323): view vi's y_hat at (level, layer) averages its
            # current gram with the detached history, which includes all
            # pushes from earlier views and earlier levels of view vi. A
            # level that is empty for a view never pushes (the reference
            # drops empty levels before the loss, model.py:256-257).
            level_nonempty = [
                (jnp.sum(pyramid_masks[i].astype(jnp.float32).reshape(v, -1),
                         axis=1) > 0) if i in live else None
                for i in range(num_levels)
            ]
            slot = jax.lax.broadcasted_iota(
                jnp.int32, (GRAM_CACHE_DEPTH, 1, 1), 0)
            cache_grams = dict(new_cache.grams)
            count = new_cache.count
            mixed = [{k: [] for k in self.style_layers}
                     for _ in range(num_levels)]
            push_flags = []
            push_grams = {k: [] for k in self.style_layers}
            for vi in range(v):
                for i in live:
                    count_snap = count
                    ne = level_nonempty[i][vi]
                    push_flags.append(ne)
                    for k in self.style_layers:
                        cache_k = cache_grams[k]
                        n_detached = jnp.minimum(count_snap,
                                                 GRAM_CACHE_DEPTH - 1)
                        detached_sum = jnp.sum(
                            jnp.where(slot < n_detached,
                                      jax.lax.stop_gradient(cache_k), 0.0),
                            axis=0)
                        denom = (n_detached + 1).astype(jnp.float32)
                        cur = y_hat_grams[i][k][vi]
                        mixed[i][k].append((cur + detached_sum) / denom)
                        cur_det = jax.lax.stop_gradient(cur)
                        push_grams[k].append(cur_det)
                        pushed = jnp.roll(cache_k, 1, axis=0).at[0].set(
                            cur_det)
                        cache_grams[k] = jnp.where(ne, pushed, cache_k)
                    count = jnp.where(
                        ne, jnp.minimum(count_snap + 1, GRAM_CACHE_DEPTH),
                        count_snap)
            for i in live:
                for k in self.style_layers:
                    y_hat_grams[i][k] = jnp.stack(mixed[i][k], axis=0)
            push_log = None
            if self.collect_push_log and push_flags:
                push_log = ({k: jnp.stack(g) for k, g in push_grams.items()},
                            jnp.stack(push_flags))
            new_cache = GramCache(grams=cache_grams, count=count,
                                  push_log=push_log)

        style_loss = jnp.zeros((), dtype=jnp.float32)
        content_loss = jnp.zeros((), dtype=jnp.float32)

        for i in live:
            for li, k in enumerate(self.style_layers):
                w = jnp.float32(self.style_weights[li])
                f = factors[i][k]  # [V]
                y_hat = y_hat_grams[i][k]
                y = (style_targets.grams[k][2]
                     if self.style_pyramid_mode == "multi"
                     else style_targets.grams[k][0])

                l = w * f * _mse_gram(y, y_hat)  # [V]

                if self.style_pyramid_mode == "multi":
                    # bad-angle areas are stylized only with the larger style
                    # image (reference :328-333), active only when non-empty.
                    if k in failed_grams[i]:
                        y_hat_failed = failed_grams[i][k]
                    else:
                        y_hat_failed = masked_gram(pred_encs[i][k],
                                                   masks_failed[i][k])
                    has_failed = (jnp.sum(masks_failed[i][k].reshape(v, -1), axis=1)
                                  > 0).astype(jnp.float32)
                    l = l + w * f * has_failed * _mse_gram(y, y_hat_failed)
                    if li > 2:
                        y_smaller = style_targets.grams[k][0]
                        l = l + w * f * _mse_gram(y_smaller, y_hat)

                style_loss = style_loss + jnp.mean(l)

            for li, k in enumerate(self.content_layers):
                f = factors[i][k]
                l = masked_mse(content_targets[i][k],
                               pred_encs[i][k], masks[i][k])
                content_loss = content_loss + jnp.mean(
                    jnp.float32(self.content_weights[li]) * f * l)

        return style_loss, content_loss, new_cache
