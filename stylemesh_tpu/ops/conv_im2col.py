"""conv3x3 as explicit im2col matmuls (XLA-built column tensor).

Round-5 finding (results/conv_v2_probe.json): on v5e, BOTH XLA's conv
lowering and in-kernel-im2col Pallas formulations of the VGG trunk's
sub-256-channel layers sit at ~7-13% MFU; the invariant cost is the
one-pixel-shifted patch assembly, which in VMEM is a sublane-misaligned
shuffle. This module moves the patch assembly to XLA in HBM — three
dx-shifted copies concatenated on the (lane-aligned, 128-multiple) channel
axis — and reduces the conv to three dy-sliced [M, 3C] @ [3C, D] matmuls,
the shape the MXU actually wants. Width-2 packing (exact, see
models/vgg.py::pack_w2d_kernel) first fills the lanes for <=64-channel
layers.

Used by the VGG trunk (models/vgg.py) behind STYLEMESH_CONV_IM2COL; the
frozen-VGG flip VJP reuses the same path for the input cotangent.

Reference trunk semantics: /root/reference/model/losses/
content_and_style_losses.py:47-70 (bit-true conv3x3+bias+relu chain).
"""

import functools

import jax
import jax.numpy as jnp

from stylemesh_tpu.ops.conv_pallas import (
    _pack_w2d_kernel_np,
    pack_width2,
    unpack_width2,
)


def _im2col_dx(x):
    """[B, H, W, C] -> [B, H+2, W, 3C]: row-padded, dx-shifted channel
    blocks (block dx holds x[:, :, w+dx-1, :]); lane-aligned for C>=128."""
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w = x.shape[2]
    return jnp.concatenate([xpad[:, :, dx:dx + w, :] for dx in range(3)],
                           axis=-1)


def _conv3x3_im2col_raw(x, w, bias, relu, precision=jax.lax.Precision.DEFAULT):
    """Core: 3 dy-sliced matmuls over the dx-im2col tensor. x: [B,H,W,C],
    w: [3,3,C,D] HWIO, bias: [D] or None."""
    b, h, wd, c = x.shape
    d = w.shape[-1]
    cols = _im2col_dx(x)  # [B, H+2, W, 3C]
    acc = None
    for dy in range(3):
        m = jax.lax.dot_general(
            cols[:, dy:dy + h].reshape(b * h * wd, 3 * c),
            w[dy].reshape(3 * c, d).astype(x.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)
        acc = m if acc is None else acc + m
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)[None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    return acc.reshape(b, h, wd, d).astype(x.dtype)


def conv3x3_im2col(x, w, bias=None, relu=False,
                   precision=jax.lax.Precision.DEFAULT):
    """3x3 stride-1 SAME conv via XLA im2col matmuls, optionally width-2
    packed (exact) to fill the 128 lanes when min(Cin, Cout) < 128.

    Forward-only: wrap with the frozen-VGG custom VJP at the call site.
    """
    cin = x.shape[-1]
    cout = w.shape[-1]
    wdt = x.shape[2]
    if min(cin, cout) < 128 and cin >= 16:
        xp = pack_width2(x)
        wp = _pack_w2d_kernel_np(w)
        bp = None if bias is None else jnp.concatenate([bias, bias])
        yp = _conv3x3_im2col_raw(xp, wp, bp, relu, precision)
        return unpack_width2(yp, wdt)
    return _conv3x3_im2col_raw(x, w, bias, relu, precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv3x3_relu_im2col(x, kernel, bias, _unused=None):
    """Fused conv3x3+bias+relu on the im2col path with the frozen-VGG
    single-residual flip VJP (mask from the output; dx = flipped-kernel
    conv of the masked cotangent; zero weight/bias cotangents)."""
    return conv3x3_im2col(x, kernel, bias, relu=True)


def _conv3x3_relu_im2col_fwd(x, kernel, bias, _unused):
    y = conv3x3_relu_im2col(x, kernel, bias, _unused)
    return y, (y, kernel, bias)


def _conv3x3_relu_im2col_bwd(_unused, res, g):
    y, kernel, bias = res
    g = jnp.where(y > 0, g, jnp.zeros((), g.dtype)).astype(y.dtype)
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_im2col(g, kt, relu=False)
    return dx, jnp.zeros_like(kernel), jnp.zeros_like(bias)


conv3x3_relu_im2col.defvjp(_conv3x3_relu_im2col_fwd, _conv3x3_relu_im2col_bwd)
