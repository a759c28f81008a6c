"""Pallas TPU kernel: 3x3 stride-1 SAME convolution as an im2col matmul.

XLA's spatial conv lowering runs the VGG trunk's wide-activation layers far
below the MXU's rate on this chip (measured: conv 64ch at full pyramid res =
12.9 TF/s, conv512 = 56 TF/s, v5e bf16 peak ~197 TF/s; tools/conv_probe.py).
The style loss spends ~80% of the training step in those convs
(reference model: /root/reference/model/losses/content_and_style_losses.py
builds the same 16-conv Gatys trunk via torch/cuDNN).

This kernel reformulates the conv as the matmul the MXU actually wants:

    out[p, co] = im2col[p, (dy,dx,ci)] @ w[(dy,dx,ci), co]

with the im2col built in VMEM from a haloed input tile (9 shifted copies),
so the contraction dim is 9*Cin (576/1152/2304/4608 for the VGG widths) and
HBM sees each input pixel once. The grid walks (batch, row tiles, col tiles);
input tiles are double-buffered with manual async DMA; the output rides the
regular Pallas out-block pipeline.

Scope: stride 1, SAME zero padding, square 3x3 kernels, bf16 in / bf16 out
with fp32 MXU accumulation — exactly the VGG trunk's shape. The wrapper pads
H/W to the tile grid (+1 halo ring); padded lanes are sliced off afterwards.

The backward pass w.r.t. the *input* is the same conv with the kernel
spatially flipped and in/out channels transposed, so `conv3x3_frozen` wires a
custom_vjp that reuses this kernel. The weight cotangent is NOT computed
(zeros): the VGG is frozen everywhere in this framework (the reference also
never trains it — model/model.py only optimizes the texture). Don't
differentiate w.r.t. ``w`` through conv3x3_frozen.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-Cin tile heuristic: keep the im2col buffer ~<=19MB and the halo waste
# small. (th, tw) are free of alignment constraints on W — the wrapper pads
# H/W up to the tile grid. Keyed by the lane-padded Cin (>= 128).
_TILES = {128: (128, 128), 256: (64, 128), 512: (32, 128)}


def _pick_tile(cin, h, w):
    th0, tw0 = _TILES.get(cin, (16, 128))
    # shrink the rounded-up grid waste: the smallest multiple-of-8 tile that
    # covers h/w in the same number of tiles as the base tile. (The out block
    # needs tw % 8 == 0; th is kept a multiple of 8 for DMA sublanes.)
    nh = -(-h // th0)
    th = -(-(-(-h // nh)) // 8) * 8
    nw = -(-w // tw0)
    tw = -(-(-(-w // nw)) // 8) * 8
    return th, tw, nh, nw


def _conv_kernel(th, tw, cin, cout, nh, nw,
                 x_hbm, w_ref, out_ref, in_buf, col_buf, sems):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    linear = (b * nh + i) * nw + j
    n_total = pl.num_programs(0) * nh * nw

    def start_load(lin, slot):
        bb = lin // (nh * nw)
        ii = (lin // nw) % nh
        jj = lin % nw
        # column origin j*tw is 8-aligned (tw % 8 == 0) and the width tw+16
        # is a sublane multiple — Mosaic requires 8-aligned HBM slices along
        # the second-minor dim. The wrapper pads 8 zero columns on the left,
        # so true col c lands at buffer col c - j*tw + 8.
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 2), pl.ds(jj * tw, tw + 16), :],
            in_buf.at[slot], sems.at[slot])

    # warm-up: first grid step issues its own load
    @pl.when(linear == 0)
    def _():
        start_load(0, 0).start()

    # prefetch the next tile into the other slot
    @pl.when(linear + 1 < n_total)
    def _():
        start_load(linear + 1, (linear + 1) % 2).start()

    slot = linear % 2
    start_load(linear, slot).wait()

    # partial im2col: one dx-shifted copy per tap column into a lane-block
    # (dst offsets dx*cin are 128-aligned; only the src sublane offset 7+dx
    # rotates — 3 rotated copies instead of 9). The dy taps then come for
    # free as major-dim row slices of col_buf.
    for dx in range(3):
        col_buf[:, :, dx * cin:(dx + 1) * cin] = (
            in_buf[slot, :, 7 + dx:7 + dx + tw, :])

    # out[p, co] = sum_dy colbuf[dy:dy+th].reshape(tpx, 3cin) @ w[dy]
    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            col_buf[dy:dy + th, :, :].reshape(th * tw, 3 * cin),
            w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out_ref[0] = acc.reshape(th, tw, cout).astype(out_ref.dtype)


def conv3x3_mxu(x, w, interpret=False):
    """3x3 stride-1 SAME conv, bf16 MXU path.

    Args:
        x: ``[B, H, W, Cin]`` (bf16 recommended; cast either way).
        w: ``[3, 3, Cin, Cout]`` HWIO.
    Returns:
        ``[B, H, W, Cout]`` bf16 (fp32 MXU accumulation).
    """
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    # lane-pad narrow channel counts: Mosaic's HBM slices must cover full
    # 128-lane tiles, so cin < 128 rides as zeros (weights padded to match —
    # the zero rows contribute nothing to the contraction).
    cin_p = max(cin, 128)
    th, tw, nh, nw = _pick_tile(cin_p, h, wdt)
    x = x.astype(jnp.bfloat16)
    # halo pad: 1 row above (+grid rounding below), 8 cols left / >=8 right —
    # column DMAs must start 8-aligned, so the left halo is a full sublane
    # and each tile loads [th+2, tw+16] starting at (i*th, j*tw).
    xp = jnp.pad(x, ((0, 0), (1, th * nh - h + 1), (8, tw * nw - wdt + 8),
                     (0, cin_p - cin)))
    w2 = jnp.pad(w.astype(jnp.bfloat16), ((0, 0), (0, 0), (0, cin_p - cin),
                                          (0, 0))).reshape(9 * cin_p, cout)

    kernel = functools.partial(_conv_kernel, th, tw, cin_p, cout, nh, nw)
    out = pl.pallas_call(
        kernel,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * cin_p, cout), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, tw, cout), lambda b, i, j: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, th * nh, tw * nw, cout),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 16, cin_p), jnp.bfloat16),
            pltpu.VMEM((th + 2, tw, 3 * cin_p), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, w2)
    return out[:, :h, :wdt, :]


# ---------------------------------------------------------------------------
# v2: width-packed im2col conv — the sub-128-channel fix (round 5).
#
# The v1 kernel above lane-pads Cin to 128 (zeros contribute nothing but the
# MXU still chews them) and leaves Cout=64 matmuls half-wide, so the 64-ch
# trunk head ran at the same ~7% MFU as XLA's lowering. v2 instead packs two
# adjacent width pixels into channels (a free contiguous reshape, exact per
# the phase-block identity in models/vgg.py::pack_w2d_kernel) so a 64->64
# conv becomes a 128->128 conv at 2x FLOPs with full 128-lane matmuls both
# ways — 50% effective vs 25% for the padded form, with no zero rows DMA'd.
# Bias + relu are fused into the accumulator write (one HBM pass).
# ---------------------------------------------------------------------------


def _conv_kernel_v2(th, tw, cin, cout, nh, nw, relu, out_dtype,
                    x_hbm, w_ref, b_ref, out_ref, in_buf, col_buf, sems):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    linear = (b * nh + i) * nw + j
    n_total = pl.num_programs(0) * nh * nw

    def start_load(lin, slot):
        bb = lin // (nh * nw)
        ii = (lin // nw) % nh
        jj = lin % nw
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * th, th + 2), pl.ds(jj * tw, tw + 16), :],
            in_buf.at[slot], sems.at[slot])

    @pl.when(linear == 0)
    def _():
        start_load(0, 0).start()

    @pl.when(linear + 1 < n_total)
    def _():
        start_load(linear + 1, (linear + 1) % 2).start()

    slot = linear % 2
    start_load(linear, slot).wait()

    for dx in range(3):
        col_buf[:, :, dx * cin:(dx + 1) * cin] = (
            in_buf[slot, :, 7 + dx:7 + dx + tw, :])

    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            col_buf[dy:dy + th, :, :].reshape(th * tw, 3 * cin),
            w_ref[dy * 3 * cin:(dy + 1) * 3 * cin, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc + b_ref[0][None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(th, tw, cout).astype(out_dtype)


def _conv3x3_v2_raw(x, w, bias, relu, interpret=False):
    """Core v2 pallas call: Cin must be VMEM-lane friendly (>= 64; use
    :func:`conv3x3_packed` for the packed entry). x: [B,H,W,Cin] bf16,
    w: [3,3,Cin,Cout], bias: [Cout] f32."""
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    th, tw, nh, nw = _pick_tile(cin, h, wdt)
    x = x.astype(jnp.bfloat16)
    xp = jnp.pad(x, ((0, 0), (1, th * nh - h + 1), (8, tw * nw - wdt + 8),
                     (0, 0)))
    w2 = w.astype(jnp.bfloat16).reshape(9 * cin, cout)
    b2 = bias.astype(jnp.float32).reshape(1, cout)

    kernel = functools.partial(_conv_kernel_v2, th, tw, cin, cout, nh, nw,
                               relu, jnp.bfloat16)
    out = pl.pallas_call(
        kernel,
        grid=(b, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * cin, cout), lambda b, i, j: (0, 0)),
            pl.BlockSpec((1, cout), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, tw, cout), lambda b, i, j: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, th * nh, tw * nw, cout),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, th + 2, tw + 16, cin), jnp.bfloat16),
            pltpu.VMEM((th + 2, tw, 3 * cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, w2, b2)
    return out[:, :h, :wdt, :]


def pack_width2(x):
    """[B,H,W,C] -> [B,H,ceil(W/2),2C] adjacent-width-pixel pack (free
    contiguous reshape; odd W pads one zero column)."""
    b, h, w, c = x.shape
    if w % 2:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return x.reshape(b, h, (w + 1) // 2, 2 * c)


def unpack_width2(xp, w):
    b, h, wp, c2 = xp.shape
    return xp.reshape(b, h, wp * 2, c2 // 2)[:, :, :w, :]


def _pack_w2d_kernel_np(kernel):
    """Host/jnp twin of models.vgg.pack_w2d_kernel (duplicated to avoid an
    ops->models import cycle): [3,3,C,D] -> [3,3,2C,2D] phase-block kernel."""
    kh, _, c, d = kernel.shape
    kp = jnp.zeros((kh, 3, 2 * c, 2 * d), kernel.dtype)
    kp = kp.at[:, 0, c:, :d].set(kernel[:, 0])
    kp = kp.at[:, 1, :c, :d].set(kernel[:, 1])
    kp = kp.at[:, 1, c:, :d].set(kernel[:, 2])
    kp = kp.at[:, 1, :c, d:].set(kernel[:, 0])
    kp = kp.at[:, 1, c:, d:].set(kernel[:, 1])
    kp = kp.at[:, 2, :c, d:].set(kernel[:, 2])
    return kp


def conv3x3_v2(x, w, bias=None, relu=False, interpret=False):
    """3x3 stride-1 SAME conv, v2 MXU path with optional fused bias+relu.

    Channel counts < 128 are width-packed to full lanes (exact). Forward
    only — wrap with the frozen-VGG custom VJP at the call site
    (models/vgg.py) so the backward reuses the same kernel with flipped
    weights.
    """
    b, h, wdt, cin = x.shape
    cout = w.shape[-1]
    if bias is None:
        bias = jnp.zeros((cout,), jnp.float32)
    if min(cin, cout) < 128 and cin >= 32:
        xp = pack_width2(x)
        wp = _pack_w2d_kernel_np(w)
        bp = jnp.concatenate([bias, bias])
        yp = _conv3x3_v2_raw(xp, wp, bp, relu, interpret=interpret)
        return unpack_width2(yp, wdt)
    return _conv3x3_v2_raw(x, w, bias, relu, interpret=interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_frozen(x, w, interpret=False):
    """conv3x3_mxu with a custom VJP for the input gradient only.

    The weight cotangent is zeros by design (frozen VGG — see module
    docstring); the input cotangent is the same kernel with the weights
    flipped and channel-transposed.
    """
    return conv3x3_mxu(x, w, interpret=interpret)


def _conv_fwd(x, w, interpret):
    return conv3x3_mxu(x, w, interpret=interpret), w


def _conv_bwd(interpret, w, g):
    wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # HWIO -> HWOI
    dx = conv3x3_mxu(g.astype(jnp.bfloat16), wt, interpret=interpret)
    return dx, jnp.zeros_like(w)


conv3x3_frozen.defvjp(_conv_fwd, _conv_bwd)
