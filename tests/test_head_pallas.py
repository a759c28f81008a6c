"""Parity gates for the fused conv+relu+maxpool kernel (ops/head_pallas.py).

Reference composition: conv3x3 SAME with fp32 accumulation over bf16
operands, + fp32 bias, relu, cast to bf16, maxpool2 — exactly the
shipping v2 conv path's numerics followed by the XLA pool.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stylemesh_tpu.ops.head_pallas import conv_relu_pool


def _ref(x, w, b):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jnp.maximum(y + b.astype(jnp.float32), 0.0).astype(jnp.bfloat16)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


@pytest.mark.parametrize("shape,c", [
    ((2, 48, 67, 64), 64),    # odd width: trailing col is conv halo only
    ((2, 48, 64, 64), 64),    # even width
    ((1, 33, 41, 64), 64),    # odd height and width
    ((2, 48, 66, 128), 128),  # direct path
    ((1, 30, 42, 128), 128),
])
def test_conv_relu_pool_parity(shape, c):
    rng = np.random.default_rng(0)
    v, h, wdt, _ = shape
    x = jnp.asarray(rng.normal(0, 1.0, (v, h, wdt, c)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.05, (c,)), jnp.float32)

    got = conv_relu_pool(x, w, b, interpret=True)
    want = _ref(x, w, b)
    assert got.shape == want.shape == (v, h // 2, wdt // 2, c)
    g = np.asarray(got, np.float32)
    t = np.asarray(want, np.float32)
    # identical math up to fp32-accumulation order inside the contraction;
    # tolerance covers the dot-order difference (packed K=384 three-way
    # split vs XLA's conv schedule) at bf16 resolution
    np.testing.assert_allclose(g, t, rtol=0.02, atol=0.02)
    assert np.mean(np.abs(g - t)) < 5e-3


@pytest.mark.parametrize("c", [64, 128])
def test_conv_relu_pool_frozen_grad_parity(c):
    """The custom-VJP wrapper's input gradient must equal autodiff through
    the reference composition (pool VJP -> relu mask -> flip conv), and
    weight/bias cotangents must be zero (frozen VGG contract)."""
    from stylemesh_tpu.models.vgg import _conv_relu_pool_frozen

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 1, (1, 24, 26, c)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.05, (c,)), jnp.float32)
    cot = jnp.asarray(rng.normal(0, 1, (1, 12, 13, c)), jnp.float32)

    def loss_fused(x, w, b):
        return jnp.sum(_conv_relu_pool_frozen(x, w, b, True)
                       .astype(jnp.float32) * cot)

    def loss_ref(x):
        # f32 conv on the bf16-rounded operands (XLA's conv transpose
        # rejects a f32 cotangent against a bf16 kernel, so the math runs
        # upcast) with the result ROUNDED TO BF16 BEFORE POOLING — the
        # pool's argmax routing must see the same bf16 values the fused
        # forward pools, or near-tie windows route gradients to different
        # pixels and the comparison is ill-posed.
        y = jax.lax.conv_general_dilated(
            x, w.astype(jnp.float32), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y + b, 0.0).astype(jnp.bfloat16)
        y = jax.lax.reduce_window(y, jnp.bfloat16(-jnp.inf), jax.lax.max,
                                  (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.sum(y.astype(jnp.float32) * cot)

    gx, gw, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gx_ref = jax.grad(loss_ref)(x.astype(jnp.float32))
    assert float(jnp.abs(gw).max()) == 0.0
    assert float(jnp.abs(gb).max()) == 0.0
    g = np.asarray(gx, np.float32)
    r = np.asarray(gx_ref, np.float32)
    # ulp-level contraction-order ties can still flip isolated pool argmax
    # routes; demand near-total agreement rather than elementwise equality
    bad = np.abs(g - r) > (0.05 + 0.05 * np.abs(r))
    assert bad.mean() < 2e-3, f"{bad.mean():.4f} of grads disagree"


@pytest.mark.parametrize("shape", [(1, 24, 26, 64), (2, 30, 33, 64)])
def test_conv_relu_pool_bwd_kernel_matches_composed(shape):
    """The fused backward kernel must match the composed backward
    (v2-conv recompute -> pool VJP -> masked flip conv) bit-for-bit: the
    in-kernel recompute uses the identical contraction split, so the pool
    routing and the transposed conv see the same bf16 values."""
    from stylemesh_tpu.models.vgg import _conv3x3_relu_v2, _maxpool2_raw
    from stylemesh_tpu.ops.head_pallas import conv_relu_pool_bwd

    rng = np.random.default_rng(7)
    v, h, wdt, c = shape
    x = jnp.asarray(rng.normal(0, 1, (v, h, wdt, c)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.05, (c,)), jnp.float32)
    g = jnp.asarray(rng.normal(0, 1, (v, h // 2, wdt // 2, c)), jnp.bfloat16)

    def composed(t):
        return _maxpool2_raw(_conv3x3_relu_v2(t, w, b, True))

    _, vjp = jax.vjp(composed, x)
    want = vjp(g)[0]
    got = conv_relu_pool_bwd(x, w, b, g, interpret=True)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_conv_relu_pool_dual_outputs():
    """The dual 128-ch kernel's pooled output must equal the single-output
    kernel's, and its pre-pool output must equal the reference conv+relu."""
    from stylemesh_tpu.ops.head_pallas import conv_relu_pool_dual

    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(0, 1, (2, 26, 30, 128)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 128, 128)), jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 0.05, (128,)), jnp.float32)
    pooled, pre = conv_relu_pool_dual(x, w, b, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(pooled, np.float32),
        np.asarray(conv_relu_pool(x, w, b, interpret=True), np.float32))
    ref_pre = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    ref_pre = jnp.maximum(ref_pre + b, 0.0).astype(jnp.bfloat16)
    g = np.asarray(pre, np.float32)
    t = np.asarray(ref_pre, np.float32)
    bad = np.abs(g - t) > (0.02 + 0.02 * np.abs(t))
    assert bad.mean() < 1e-3


def test_conv_relu_pool_rejects_bad_channels():
    x = jnp.zeros((1, 8, 8, 32), jnp.bfloat16)
    w = jnp.zeros((3, 3, 32, 32), jnp.bfloat16)
    b = jnp.zeros((32,), jnp.float32)
    with pytest.raises(AssertionError):
        conv_relu_pool(x, w, b, interpret=True)
