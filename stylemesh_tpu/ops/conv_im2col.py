"""Small-Cin 3x3 conv as an explicit im2col matmul (XLA-level).

XLA's spatial conv lowering collapses on tiny channel counts: conv1_1
(3->64) at level-3 runs at 0.7% MFU, 16.4 ms f+b (results/mfu.json) — the
MXU sees a K=27 contraction but the lowering pays full-lane padding on
every tile. Building the im2col tensor explicitly (9 shifted copies,
[V,H,W,27]) and contracting it as ONE matmul runs near the memory roofline
instead: the same trick measured 2.7x faster than the conv op for a 64-ch
1x1 (tools/conv_wall_probe.py's reshape-dot row).

The custom VJP keeps the frozen-VGG contract (zero weight/bias cotangents,
stylemesh_tpu/models/vgg.py docstring) and transposes the im2col by 9
shifted scatter-adds of the K-sliced cotangent — all elementwise traffic,
no conv lowering anywhere in the backward.

Reference semantics: the first VGG conv in
/root/reference/model/losses/content_and_style_losses.py:47 (conv1_1 ->
relu); math unchanged, exact up to f32 contraction order.
"""

import functools

import jax
import jax.numpy as jnp


def _im2col(x):
    """[V, H, W, C] -> [V, H, W, 9C] SAME-padded tap stack in (ky, kx, ci)
    order — matching ``w.reshape(9C, D)`` of an HWIO kernel."""
    v, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + wd, :]
            for dy in range(3) for dx in range(3)]
    return jnp.concatenate(cols, axis=-1)


def _forward(x, w, bias, relu):
    v, h, wd, c = x.shape
    d = w.shape[-1]
    xc = _im2col(x)
    y = jax.lax.dot_general(
        xc, w.reshape(9 * c, d).astype(xc.dtype),
        dimension_numbers=(((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_im2col(x, w, bias, relu=True):
    """3x3 SAME conv (+bias, optional fused relu) via explicit im2col.

    Intended for tiny Cin (conv1_1's 3): the im2col tensor is 9*Cin wide,
    so the materialization cost scales with Cin — do not use past ~32.
    Frozen weights: dw/db cotangents are zeros by design.
    """
    return _forward(x, w, bias, relu)


def _fwd(x, w, bias, relu):
    y = _forward(x, w, bias, relu)
    return y, (y, x.shape, w, bias)


def _bwd(relu, res, g):
    y, x_shape, w, bias = res
    v, h, wd, c = x_shape
    d = w.shape[-1]
    if relu:
        # mask from the OUTPUT (exact: relu output is 0 iff pre-act <= 0)
        g = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
    dxc = jax.lax.dot_general(
        g, w.reshape(9 * c, d).astype(g.dtype),
        dimension_numbers=(((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [V, H, W, 9C]
    dxp = jnp.zeros((v, h + 2, wd + 2, c), jnp.float32)
    for t in range(9):
        dy, dx = divmod(t, 3)
        dxp = dxp.at[:, dy:dy + h, dx:dx + wd, :].add(
            dxc[..., t * c:(t + 1) * c])
    dx = dxp[:, 1:1 + h, 1:1 + wd, :].astype(g.dtype)
    return dx, jnp.zeros_like(w), jnp.zeros_like(bias)


conv3x3_im2col.defvjp(_fwd, _bwd)
