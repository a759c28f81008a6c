"""Gram matrices over VGG feature maps, with static-shape masked variants.

Reference semantics (/root/reference/model/losses/content_and_style_losses.py):
- ``GramMatrix`` (:74-80): ``G = F @ F^T / (h*w)`` over ``[B, C, h*w]``.
- ``masked_features`` (:136-143) selects the N masked pixels, so the Gram of a
  masked feature map divides by the *number of selected pixels*; an empty
  mask yields an all-zero feature tensor (hence a zero Gram).

Under jit we can't produce variable-length feature sets, so the masked Gram is
reformulated as a mask-weighted Gram: since the mask is 0/1,
``G = (F*m) @ (F*m)^T / sum(m)`` is identical to the gather-then-Gram form.

Features are channel-last ``[B, H, W, C]``; Grams are ``[B, C, C]``.
Matmuls are pinned to full-precision accumulation (the platform default here
is low-precision): Gram values feed MSE losses directly, so bf16 passes
visibly corrupt the style loss.
"""

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST


def _gram_precision(dtype):
    """f32 inputs need HIGHEST (the platform default is low-precision
    passes); bf16 inputs take the native one-pass MXU path, which is
    BIT-IDENTICAL to casting them to f32 under HIGHEST — bf16 x bf16
    products are exact in the fp32 accumulator."""
    return _PREC if dtype == jnp.float32 else jax.lax.Precision.DEFAULT


def gram_matrix(features):
    """``[B, H, W, C] -> [B, C, C]`` fp32, divided by the pixel count H*W."""
    b, h, w, c = features.shape
    f = features.reshape(b, h * w, c)
    g = jnp.einsum("bpc,bpd->bcd", f, f,
                   precision=_gram_precision(features.dtype),
                   preferred_element_type=jnp.float32)
    return g / jnp.asarray(h * w, dtype=g.dtype)


def masked_gram(features, mask):
    """Gram over the masked pixels only, divided by the per-item mask count.

    Args:
        features: ``[B, H, W, C]``.
        mask: ``[B, H, W, 1]`` (0/1 float or bool).
    Returns:
        ``[B, C, C]`` fp32; all-zero rows for items with an empty mask
        (matching the reference's zero-feature fallback).
    """
    b, h, w, c = features.shape
    m = mask.astype(features.dtype)
    fm = (features * m).reshape(b, h * w, c)
    g = jnp.einsum("bpc,bpd->bcd", fm, fm,
                   precision=_gram_precision(features.dtype),
                   preferred_element_type=jnp.float32)
    count = jnp.sum(m.astype(jnp.float32).reshape(b, -1), axis=1)
    denom = jnp.where(count > 0, count, 1.0).astype(g.dtype)
    return g / denom[:, None, None]


def masked_mse(a, b, mask):
    """MSE over masked pixels of two ``[B, H, W, C]`` maps, averaged per item.

    Matches ``nn.MSELoss()(masked_features(a, m), masked_features(b, m))`` at
    batch size 1: the mean over ``C * N_selected`` elements; 0 for an empty
    mask (both gathered tensors are zeros in the reference). Returns ``[B]``.
    """
    bsz, h, w, c = a.shape
    m = mask.astype(jnp.float32)
    d = (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2 * m
    num = jnp.sum(d.reshape(bsz, -1), axis=1)
    count = jnp.sum(m.reshape(bsz, -1), axis=1) * c
    return jnp.where(count > 0, num / jnp.maximum(count, 1.0), 0.0)


def mse(a, b):
    """Plain MSE over all elements, per batch item. Returns ``[B]``."""
    d = (a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2
    return jnp.mean(d.reshape(d.shape[0], -1), axis=1)
