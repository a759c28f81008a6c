"""Learnable texture atlases as pytrees.

Reference: ``NeuralTexture`` / ``HierarchicalNeuralTexture``
(/root/reference/model/texture/texture.py:22-135) — a single ``[C, H, W]``
parameter, or a Laplacian pyramid of them at ``W/2^i`` that is sampled at the
same UV grid per layer and summed. The atlas lives in Gatys-preprocessed
space and is clamped to ``[-123.68, 151.061]`` every step (:41-44); in this
functional rebuild the clamp is applied to the parameters after each
optimizer update (equivalent: the reference's in-place clamp happens before
every forward, so the forward always sees clamped values).

TPU-first: the texture is an unbatched channel-last ``[H, W, C]`` array per
layer (one atlas shared by all views in the batch); sampling is the
scatter-add-VJP bilinear gather from :mod:`stylemesh_tpu.ops.grid_sample`.
"""

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from stylemesh_tpu.ops.color import GATYS_MAX, GATYS_MIN
from stylemesh_tpu.ops.grid_sample import (
    grid_sample,
    grid_sample_planned_cf,
)


class Texture(NamedTuple):
    """A (possibly hierarchical) texture atlas.

    ``layers[i]`` has shape ``[H // 2**i, W // 2**i, C]``. A plain
    (non-hierarchical) texture is simply ``num_layers == 1``.
    """

    layers: Tuple[jax.Array, ...]

    @property
    def shape(self):
        return self.layers[0].shape

    @property
    def num_layers(self):
        return len(self.layers)

    @staticmethod
    def create(width, height, channels=3, num_layers=1, random_init=False,
               rng=None, dtype=jnp.float32):
        layers = []
        for i in range(num_layers):
            shape = (height // 2 ** i, width // 2 ** i, channels)
            if random_init:
                key = jax.random.fold_in(rng if rng is not None else jax.random.key(0), i)
                layers.append(jax.random.uniform(key, shape, dtype=dtype))
            else:
                layers.append(jnp.zeros(shape, dtype=dtype))
        return Texture(layers=tuple(layers))

    @staticmethod
    def from_arrays(arrays):
        arrays = [jnp.asarray(a) for a in arrays]
        h, w, c = arrays[0].shape
        for i, a in enumerate(arrays):
            assert a.shape == (h // 2 ** i, w // 2 ** i, c), (i, a.shape)
        return Texture(layers=tuple(arrays))


# Alias kept for reference-parity naming; a hierarchical texture is just a
# Texture with num_layers > 1.
HierarchicalTexture = Texture


def clamp_texture(texture: Texture) -> Texture:
    """Clamp every layer to the valid Gatys pixel range (texture.py:43)."""
    return Texture(layers=tuple(jnp.clip(l, GATYS_MIN, GATYS_MAX) for l in texture.layers))


def texture_channel_first(texture: Texture):
    """One channel-first ``[C, H, W]`` copy per layer (the layout the Pallas
    window kernels DMA from — a 3-wide minor dim can't be tiled). Hoist this
    once per step; its transposes are differentiable."""
    return tuple(l.transpose(2, 0, 1) for l in texture.layers)


def sample_texture(texture: Texture, grid, plans=None, texture_cf=None,
                   compute="f32"):
    """Sample all layers at ``grid [..., 2]`` ((x,y) in [-1,1]) and sum.

    Matches ``HierarchicalNeuralTexture.forward`` (texture.py:96-100); for a
    single layer it is exactly ``NeuralTexture.forward`` minus the in-place
    clamp (applied at the optimizer instead).

    ``plans``: optional per-layer splat plans (PlanArrays) enabling the
    Pallas fast-path kernels (identical gradients, ~30x faster scatter).
    ``texture_cf``: optional precomputed :func:`texture_channel_first`
    (pass it when sampling several pyramid levels so the transposes are paid
    once per step, not per (level, layer)).
    """
    out = None
    for li, layer in enumerate(texture.layers):
        if plans is not None and plans[li] is not None:
            lcf = (texture_cf[li] if texture_cf is not None
                   else layer.transpose(2, 0, 1))
            y = grid_sample_planned_cf(lcf, grid, plans[li], compute)
        else:
            y = grid_sample(layer, grid)
        out = y if out is None else out + y
    return out


def texture_regularizer(texture: Texture, weights):
    """Weighted L2 on the pyramid layers (texture.py:102-108)."""
    reg = 0.0
    for w, layer in zip(weights, texture.layers):
        reg = reg + jnp.mean(jnp.square(layer.astype(jnp.float32))) * w
    return reg


def texture_image(texture: Texture):
    """Compose the pyramid into a full-res ``[H, W, C]`` image.

    Reference ``get_image`` (texture.py:110-121) samples the whole pyramid at
    a dense identity grid covering [-1,1]², i.e. each coarser layer is
    bilinearly upsampled (align_corners=True) to the base resolution and all
    layers are summed.
    """
    h, w, _ = texture.layers[0].shape
    xs = jnp.linspace(-1.0, 1.0, w)
    ys = jnp.linspace(-1.0, 1.0, h)
    grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    return sample_texture(texture, grid)
