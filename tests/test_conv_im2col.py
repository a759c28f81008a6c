"""Parity for the small-Cin im2col conv (ops/conv_im2col.py): forward vs
XLA's conv, and input-VJP vs autodiff through the reference composition."""

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.ops.conv_im2col import conv3x3_im2col


def _ref(x, w, b, relu=True):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def test_forward_parity_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 24, 31, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    got = conv3x3_im2col(x, w, b)
    want = _ref(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_bf16():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 17, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 64)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
    got = np.asarray(conv3x3_im2col(x, w, b), np.float32)
    want = np.asarray(_ref(x, w, b), np.float32)
    np.testing.assert_allclose(got, want, rtol=0.02, atol=0.02)


def test_input_grad_parity():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (2, 12, 13, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 8)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (8,)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (2, 12, 13, 8)), jnp.float32)

    def loss_new(x):
        return jnp.sum(conv3x3_im2col(x, w, b) * cot)

    def loss_ref(x):
        return jnp.sum(_ref(x, w, b) * cot)

    g_new = jax.grad(loss_new)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_frozen_weight_cotangents():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.2, (3, 3, 3, 8)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.2, (8,)), jnp.float32)
    gw, gb = jax.grad(lambda w, b: jnp.sum(conv3x3_im2col(x, w, b)),
                      argnums=(0, 1))(w, b)
    assert float(jnp.abs(gw).max()) == 0.0
    assert float(jnp.abs(gb).max()) == 0.0
