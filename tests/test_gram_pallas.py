"""Parity tests for the fused multi-mask Gram kernel (interpret mode, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemesh_tpu.ops.gram import masked_gram
from stylemesh_tpu.ops.gram_pallas import fused_masked_grams, stack_masks


def _setup(v=2, h=512, w=300, c=64, k=2, seed=0):
    rng = np.random.default_rng(seed)
    f = jnp.asarray(rng.normal(size=(v, h, w, c)), jnp.bfloat16)
    masks = jnp.asarray(rng.random((k, v, h, w)) < 0.6, jnp.float32)
    return f, masks


def _reference_sums(f, masks):
    """Raw sums via the XLA masked_gram (multiply back by counts)."""
    out = []
    for k in range(masks.shape[0]):
        m = masks[k][..., None]
        g = masked_gram(f, m)  # divided by count
        count = jnp.sum(m.astype(jnp.float32).reshape(f.shape[0], -1), axis=1)
        denom = jnp.where(count > 0, count, 1.0)
        out.append(g * denom[:, None, None])
    return jnp.stack(out, axis=1)  # [V, K, C, C]


def test_gram_sums_forward_parity():
    f, masks = _setup()
    ref = np.asarray(_reference_sums(f, masks), np.float32)
    mt = stack_masks(masks)
    got = np.asarray(fused_masked_grams(f, mt, True), np.float32)
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() / scale < 1e-3


def test_gram_sums_forward_empty_mask():
    f, masks = _setup(k=2)
    masks = masks.at[1].set(0.0)  # variant 1 empty -> zero gram
    mt = stack_masks(masks)
    got = np.asarray(fused_masked_grams(f, mt, True), np.float32)
    assert np.abs(got[:, 1]).max() == 0.0


def test_gram_sums_gradient_parity():
    f, masks = _setup(v=1, h=256, w=256, c=64, k=2, seed=1)
    rng = np.random.default_rng(2)
    w_ct = jnp.asarray(rng.normal(size=(1, 2, 64, 64)), jnp.float32)

    def loss_ref(f):
        return jnp.sum(_reference_sums(f, masks) * w_ct)

    def loss_plls(f):
        mt = stack_masks(masks)
        return jnp.sum(fused_masked_grams(f, mt, True) * w_ct)

    gr = np.asarray(jax.grad(loss_ref)(f), np.float32)
    gp = np.asarray(jax.grad(loss_plls)(f), np.float32)
    scale = np.abs(gr).max()
    assert np.abs(gr - gp).max() / scale < 2e-2  # bf16 S rounding


def test_multi_view_multi_chunk():
    # P large enough for >1 chunk per view exercises the accumulator reset
    f, masks = _setup(v=3, h=1024, w=260, c=128, k=1, seed=3)
    ref = np.asarray(_reference_sums(f, masks), np.float32)
    got = np.asarray(fused_masked_grams(f, stack_masks(masks), True),
                     np.float32)
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() / scale < 1e-3
