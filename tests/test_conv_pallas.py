"""Parity tests for the Pallas 3x3 conv kernel (interpret mode on CPU).

The kernel implements exactly lax.conv_general_dilated(stride 1, SAME,
NHWC/HWIO) in bf16; parity is checked in bf16 against the XLA conv (both
round identically except for accumulation order), and the custom-vjp input
gradient against the XLA conv's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemesh_tpu.ops.conv_pallas import conv3x3_frozen, conv3x3_mxu


def _xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)


CASES = [
    (1, 24, 33, 64, 64),    # ragged W, tile rounding
    (2, 16, 16, 64, 128),   # channel widening
    (1, 8, 128, 128, 64),   # exact tile fit
]


@pytest.mark.parametrize("b,h,w,cin,cout", CASES)
def test_conv_forward_parity(b, h, w, cin, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
    ref = np.asarray(_xla_conv(x, k), np.float32)
    got = np.asarray(conv3x3_mxu(x, k, interpret=True), np.float32)
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() / scale < 2e-2
    # interior pixels see the same 9-tap footprint; borders the same zeros
    assert got.shape == ref.shape


def test_conv_input_gradient_parity():
    b, h, w, cin, cout = 1, 16, 24, 64, 64
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.bfloat16)
    ct = jnp.asarray(rng.normal(size=(b, h, w, cout)), jnp.bfloat16)

    def loss_ref(x):
        return jnp.sum(_xla_conv(x, k).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    def loss_plls(x):
        return jnp.sum(conv3x3_frozen(x, k, True).astype(jnp.float32)
                       * ct.astype(jnp.float32))

    gr = np.asarray(jax.grad(loss_ref)(x), np.float32)
    gp = np.asarray(jax.grad(loss_plls)(x), np.float32)
    assert np.abs(gr - gp).max() / np.abs(gr).max() < 4e-2


def test_weight_cotangent_is_zero_by_design():
    # conv3x3_frozen documents dL/dw == 0 (frozen VGG); assert the contract
    # so accidental reuse for trainable weights fails loudly in review.
    b, h, w, c = 1, 8, 8, 64
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.bfloat16)
    g = jax.grad(lambda k: jnp.sum(
        conv3x3_frozen(x, k, True).astype(jnp.float32)))(k)
    assert float(jnp.abs(g).max()) == 0.0
