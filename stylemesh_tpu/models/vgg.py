"""VGG-16 feature extractor (Gatys variant) as a pure JAX function.

Mirrors the 16-conv/5-pool feature trunk the reference uses for the style and
content losses (/root/reference/model/losses/content_and_style_losses.py:7-70):
any subset of the 21 named activations ``r11..r54, p1..p5`` can be requested.

TPU-first design choices:
- NHWC layout (images channel-last) with HWIO kernels — XLA's native conv
  layout on TPU.
- Configurable compute dtype: ``bfloat16`` activations/weights feed the MXU
  at full rate; accumulation stays fp32 via ``preferred_element_type``.
- The network is pure: ``params`` is a dict pytree, no module state, freezing
  is just not differentiating w.r.t. it.

Weights come from the reference's ``vgg_conv.pth`` (torch state dict, OIHW)
via :func:`convert_torch_state_dict`, stored as an ``.npz``.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.ops.conv_im2col import conv3x3_im2col
from stylemesh_tpu.ops.conv_pallas import conv3x3_frozen
from stylemesh_tpu.ops.head_pallas import (conv_relu_pool,
                                            conv_relu_pool_bwd,
                                            conv_relu_pool_dual)

# (name, in_channels, out_channels) for the 13 convs of VGG-16 in trunk order.
VGG_CONVS = [
    ("conv1_1", 3, 64), ("conv1_2", 64, 64),
    ("conv2_1", 64, 128), ("conv2_2", 128, 128),
    ("conv3_1", 128, 256), ("conv3_2", 256, 256), ("conv3_3", 256, 256), ("conv3_4", 256, 256),
    ("conv4_1", 256, 512), ("conv4_2", 512, 512), ("conv4_3", 512, 512), ("conv4_4", 512, 512),
    ("conv5_1", 512, 512), ("conv5_2", 512, 512), ("conv5_3", 512, 512), ("conv5_4", 512, 512),
]

# Channel count of every named activation (relu outputs + pooled maps).
VGG_LAYER_CHANNELS = {
    "r11": 64, "r12": 64, "p1": 64,
    "r21": 128, "r22": 128, "p2": 128,
    "r31": 256, "r32": 256, "r33": 256, "r34": 256, "p3": 256,
    "r41": 512, "r42": 512, "r43": 512, "r44": 512, "p4": 512,
    "r51": 512, "r52": 512, "r53": 512, "r54": 512, "p5": 512,
}

# trunk order: (activation name, conv name or pool marker)
_TRUNK = [
    ("r11", "conv1_1"), ("r12", "conv1_2"), ("p1", None),
    ("r21", "conv2_1"), ("r22", "conv2_2"), ("p2", None),
    ("r31", "conv3_1"), ("r32", "conv3_2"), ("r33", "conv3_3"), ("r34", "conv3_4"), ("p3", None),
    ("r41", "conv4_1"), ("r42", "conv4_2"), ("r43", "conv4_3"), ("r44", "conv4_4"), ("p4", None),
    ("r51", "conv5_1"), ("r52", "conv5_2"), ("r53", "conv5_3"), ("r54", "conv5_4"), ("p5", None),
]


def init_vgg_params(rng=None, dtype=jnp.float32, scale=0.05, he=False):
    """Random VGG params (tests / weight-free benchmarking).

    ``he=True`` uses He-normalized per-layer scales (sqrt(2/fan_in)) so
    activations stay O(1) through the trunk. A fixed global ``scale`` makes
    deep activations explode (gain ~ scale*sqrt(9*C) per conv), which turns
    the loss Jacobian chaotic — ulp-level input rounding then flips ReLU
    masks and reroutes large cotangent mass, making per-pixel gradient
    comparisons between differently-scheduled-but-equivalent computations
    (e.g. sharded vs single-chip) ill-posed. Parity tests should pass he=True.
    """
    rng = np.random.default_rng(0 if rng is None else rng)
    params = {}
    for name, cin, cout in VGG_CONVS:
        s = float(np.sqrt(2.0 / (9 * cin))) if he else scale
        params[name] = {
            "kernel": jnp.asarray(
                rng.normal(0.0, s, size=(3, 3, cin, cout)), dtype=dtype),
            "bias": jnp.asarray(rng.normal(0.0, 0.05 if he else scale,
                                           size=(cout,)), dtype=dtype),
        }
    return params


def convert_torch_state_dict(state_dict):
    """torch ``vgg_conv.pth`` state dict (OIHW numpy/tensors) -> params pytree."""
    params = {}
    for name, cin, cout in VGG_CONVS:
        wk = state_dict[f"{name}.weight"]
        bk = state_dict[f"{name}.bias"]
        w = np.asarray(wk, dtype=np.float32)
        b = np.asarray(bk, dtype=np.float32)
        assert w.shape == (cout, cin, 3, 3), (name, w.shape)
        params[name] = {
            "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # OIHW -> HWIO
            "bias": jnp.asarray(b),
        }
    return params


def save_vgg_params(params, path):
    flat = {}
    for name, p in params.items():
        flat[f"{name}.kernel"] = np.asarray(p["kernel"])
        flat[f"{name}.bias"] = np.asarray(p["bias"])
    np.savez(path, **flat)


def load_vgg_params(path, dtype=jnp.float32):
    data = np.load(path)
    params = {}
    for name, _, _ in VGG_CONVS:
        params[name] = {
            "kernel": jnp.asarray(data[f"{name}.kernel"], dtype=dtype),
            "bias": jnp.asarray(data[f"{name}.bias"], dtype=dtype),
        }
    return params


def _conv3x3_xla(x, kernel, bias, precision):
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return out + bias.astype(out.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_flipvjp(x, kernel, bias, precision):
    """conv3x3 whose input gradient is an explicit flipped-kernel forward
    conv (the exact stride-1 SAME transpose identity) instead of XLA's
    auto-derived transpose, which lowers ~30% slower on v5e (trunk fwd+vjp
    204.6 -> 157.4 ms at V=4, tools/loss_anatomy.py). Bit-identical
    gradients (verified maxdiff 0.0 on CPU). Weight/bias cotangents are
    zeros — the VGG is frozen everywhere in this framework (the reference
    never trains it either, model/model.py). STYLEMESH_CONV_FLIPVJP=0
    restores the auto VJP."""
    return _conv3x3_xla(x, kernel, bias, precision)


def _conv3x3_flip_fwd(x, kernel, bias, precision):
    return _conv3x3_xla(x, kernel, bias, precision), (kernel, bias)


def _conv3x3_flip_bwd(precision, res, g):
    kernel, bias = res
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g, kt.astype(g.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return dx, jnp.zeros_like(kernel), jnp.zeros_like(bias)


_conv3x3_flipvjp.defvjp(_conv3x3_flip_fwd, _conv3x3_flip_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_relu_flipvjp(x, kernel, bias, precision):
    """Fused conv3x3 + bias + relu with a single-residual backward.

    Standard autodiff materializes BOTH the pre-relu conv output (saved by
    relu's VJP to form the mask) and the post-relu activation — two
    full-size HBM writes per trunk layer. Fusing the relu into the conv's
    custom VJP lets the backward recompute the mask from the *output*
    (``y > 0``; exact because relu output is zero iff pre-activation <= 0),
    so only ``y`` is saved — and ``y`` is the layer's return value anyway,
    making the residual free. Backward = mask-multiply fused into the
    flipped-kernel forward conv (see ``_conv3x3_flipvjp``). Weight/bias
    cotangents are zeros (frozen VGG contract, ``vgg_features`` docstring).
    """
    return jax.nn.relu(_conv3x3_xla(x, kernel, bias, precision))


def _conv3x3_relu_flip_fwd(x, kernel, bias, precision):
    y = jax.nn.relu(_conv3x3_xla(x, kernel, bias, precision))
    return y, (y, kernel, bias)


def _conv3x3_relu_flip_bwd(precision, res, g):
    y, kernel, bias = res
    g = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = jax.lax.conv_general_dilated(
        g, kt.astype(g.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return dx, jnp.zeros_like(kernel), jnp.zeros_like(bias)


_conv3x3_relu_flipvjp.defvjp(_conv3x3_relu_flip_fwd, _conv3x3_relu_flip_bwd)


def pack_w2d_kernel(kernel):
    """[3,3,C,D] -> [3,3,2C,2D] width-to-depth phase-block kernel.

    Output phase p at packed col j is the original conv at col 2j+p, which
    sums original cols 2j+p-1..2j+p+1 — all inside packed cols j-1..j+1:
        p=0: (kw=0, ph_in=1)<-K[:,0], (kw=1, ph_in=0)<-K[:,1],
             (kw=1, ph_in=1)<-K[:,2]
        p=1: (kw=1, ph_in=0)<-K[:,0], (kw=1, ph_in=1)<-K[:,1],
             (kw=2, ph_in=0)<-K[:,2]
    6 of 12 blocks nonzero -> exactly 2x the original FLOPs, with full
    128-lane MXU rows for C,D <= 64 layers (see w2d_conv3x3)."""
    kh, _, c, d = kernel.shape
    kp = jnp.zeros((kh, 3, 2 * c, 2 * d), kernel.dtype)
    kp = kp.at[:, 0, c:, :d].set(kernel[:, 0])
    kp = kp.at[:, 1, :c, :d].set(kernel[:, 1])
    kp = kp.at[:, 1, c:, :d].set(kernel[:, 2])
    kp = kp.at[:, 1, :c, d:].set(kernel[:, 0])
    kp = kp.at[:, 1, c:, d:].set(kernel[:, 1])
    kp = kp.at[:, 2, :c, d:].set(kernel[:, 2])
    return kp


def w2d_conv3x3(x, kernel, bias, precision, relu=False):
    """Exact conv3x3 with adjacent width pixels packed into channels.

    The sub-128-lane trunk layers are MXU-starved (tools/mfu_probe.py on
    v5e: conv1_1 0.7% MFU, conv1_2 7.1%, conv2_1 13.3% vs conv4_x ~58%):
    with <=64 output channels half the systolic array idles and the big
    spatial extents pay lane-padding on every tile. Packing
    ``[V,H,W,C] -> [V,H,W/2,2C]`` (a free contiguous reshape) and running
    the phase-block kernel (``pack_w2d_kernel``) doubles the FLOPs but
    fills the lanes; measured it's the difference between 7% and ~40%+
    effective MFU (tools/w2d_probe.py). Odd widths pad one zero column
    and slice it back off — bit-exact either way (f32 parity gated in
    tests/test_vgg.py). relu=True fuses the single-residual relu VJP."""
    v, h, w, c = x.shape
    d = kernel.shape[-1]
    wp = w + (w % 2)
    if wp != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    xp = x.reshape(v, h, wp // 2, 2 * c)
    kp = pack_w2d_kernel(kernel)
    bp = jnp.concatenate([bias, bias])
    if os.environ.get("STYLEMESH_CONV_FLIPVJP", "1") != "0":
        yp = (_conv3x3_relu_flipvjp if relu else _conv3x3_flipvjp)(
            xp, kp, bp, precision)
    else:  # VJP-path parity tests: auto-derived transpose throughout
        yp = _conv3x3_xla(xp, kp, bp, precision)
        if relu:
            yp = jax.nn.relu(yp)
    y = yp.reshape(v, h, wp, d)
    return y[:, :, :w] if wp != w else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv3x3_relu_v2(x, kernel, bias, interpret):
    """Fused conv3x3+bias+relu on the v2 width-packed Pallas path
    (ops/conv_pallas.py::conv3x3_v2) with the frozen-VGG flip VJP.

    Same single-residual backward as ``_conv3x3_relu_flipvjp`` (mask from
    the output, dx = flipped-kernel conv of the masked cotangent) but both
    convs run the Pallas kernel. bf16 in/out, fp32 MXU accumulation.
    """
    from stylemesh_tpu.ops.conv_pallas import conv3x3_v2

    return conv3x3_v2(x, kernel, bias, relu=True, interpret=interpret)


def _conv3x3_relu_v2_fwd(x, kernel, bias, interpret):
    y = _conv3x3_relu_v2(x, kernel, bias, interpret)
    return y, (y, kernel, bias)


def _conv3x3_relu_v2_bwd(interpret, res, g):
    from stylemesh_tpu.ops.conv_pallas import conv3x3_v2

    y, kernel, bias = res
    g = jnp.where(y > 0, g, jnp.zeros((), g.dtype)).astype(jnp.bfloat16)
    kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_v2(g, kt, relu=False, interpret=interpret)
    return dx, jnp.zeros_like(kernel), jnp.zeros_like(bias)


_conv3x3_relu_v2.defvjp(_conv3x3_relu_v2_fwd, _conv3x3_relu_v2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _conv_relu_pool_frozen(x, kernel, bias, interpret):
    """Fused ``maxpool2(relu(conv3x3 + bias))`` block tail on the Pallas
    path (ops/head_pallas.py) with the frozen-VGG contract.

    Forward: ONE kernel — no conv-output HBM round trip, no separate pool
    pass (the trunk head is memory-bound; see the head_pallas module
    docstring for the round-5 measurements). Backward, 64-ch: one fused
    kernel (in-tile conv recompute, first-max + relu-mask routing,
    transposed phase-block conv). Backward, 128-ch: the forward emits the
    pre-pool activation as a second output and the VJP reuses it (pool VJP
    + masked flip conv) — the earlier recompute-based composed backward
    cost more than the forward fusion saved (round-5 flag A/B: step 390.8
    -> 399.3 ms), the saved residual removes exactly that recompute.
    """
    if kernel.shape[-1] == 64:
        return conv_relu_pool(x, kernel, bias, interpret=interpret)
    return conv_relu_pool_dual(x, kernel, bias, interpret=interpret)[0]


def _crp_fwd(x, kernel, bias, interpret):
    if kernel.shape[-1] == 64:
        y = conv_relu_pool(x, kernel, bias, interpret=interpret)
        return y, (x, kernel, bias, None)
    y, pre = conv_relu_pool_dual(x, kernel, bias, interpret=interpret)
    return y, (None, kernel, bias, pre)


def _crp_bwd(interpret, res, g):
    x, kernel, bias, pre = res
    if pre is not None:
        # 128-ch: pool VJP from the saved pre-pool activation, then the
        # relu-masked flipped-kernel conv on the v2 path
        from stylemesh_tpu.ops.conv_pallas import conv3x3_v2

        _, pool_vjp = jax.vjp(_maxpool2_raw, pre)
        (dr,) = pool_vjp(g.astype(pre.dtype))
        dr = jnp.where(pre > 0, dr, jnp.zeros((), dr.dtype))
        kt = jnp.flip(kernel, axis=(0, 1)).transpose(0, 1, 3, 2)
        dx = conv3x3_v2(dr.astype(jnp.bfloat16), kt, relu=False,
                        interpret=interpret)
        return dx, jnp.zeros_like(kernel), jnp.zeros_like(bias)
    if os.environ.get("STYLEMESH_FUSED_POOL_BWD", "1") != "0":
        # 64-ch: single fused kernel — recompute conv+relu in-tile
        # (bit-identical contraction split -> identical pool routing),
        # first-max + relu mask, transposed conv; no r/dr HBM round trips.
        dx = conv_relu_pool_bwd(x, kernel, bias, g, interpret=interpret)
        return dx, jnp.zeros_like(kernel), jnp.zeros_like(bias)
    f = lambda t: _maxpool2_raw(_conv3x3_relu_v2(  # noqa: E731
        t, kernel, bias.astype(jnp.float32), interpret))
    _, vjp = jax.vjp(f, x)
    return vjp(g.astype(jnp.bfloat16))[0], jnp.zeros_like(kernel), \
        jnp.zeros_like(bias)


_conv_relu_pool_frozen.defvjp(_crp_fwd, _crp_bwd)


def _fused_pool_wanted(x, kernel, precision, fused_relu, pool, name_wanted):
    """Fuse a conv+relu+maxpool block tail into the single Pallas kernel
    (STYLEMESH_FUSED_POOL_CONV, default on for the TPU bf16 trunk): exact
    block-tail shapes only (Cin == Cout in {64, 128}), max pool, and the
    conv's own activation not requested by the caller."""
    if os.environ.get("STYLEMESH_FUSED_POOL_CONV", "1") == "0":
        return False
    return (fused_relu and pool == "max" and not name_wanted
            and x.dtype == jnp.bfloat16 and kernel.dtype == jnp.bfloat16
            and precision in (None, jax.lax.Precision.DEFAULT)
            and x.shape[-1] == kernel.shape[-1]
            and x.shape[-1] in (64, 128)
            and x.shape[1] >= 2 and x.shape[2] >= 2
            and jax.default_backend() == "tpu")


def _im2col_wanted(x, kernel, precision, fused_relu):
    """conv1_1's 3-wide input runs the explicit-im2col matmul
    (ops/conv_im2col.py, STYLEMESH_CONV_IM2COL default on): XLA's conv
    lowering runs 3->64 at 0.7% MFU (results/mfu.json)."""
    if os.environ.get("STYLEMESH_CONV_IM2COL", "1") == "0":
        return False
    return (fused_relu
            and x.dtype == jnp.bfloat16 and kernel.dtype == jnp.bfloat16
            and precision in (None, jax.lax.Precision.DEFAULT)
            and x.shape[-1] < 32
            and jax.default_backend() == "tpu")


def _v2_wanted(x, kernel, precision, fused_relu):
    """The v2 Pallas conv path (STYLEMESH_CONV_V2, default on for TPU bf16):
    exact trunk shapes only — bf16 compute, DEFAULT precision, Cin >= 32
    (conv1_1's 3-wide minor dim can't DMA; it stays on XLA), relu fused
    (the trunk always fuses; the A/B fallback paths don't hit v2)."""
    if os.environ.get("STYLEMESH_CONV_V2", "1") == "0":
        return False
    return (fused_relu
            and x.dtype == jnp.bfloat16 and kernel.dtype == jnp.bfloat16
            and precision in (None, jax.lax.Precision.DEFAULT)
            and x.shape[-1] >= 32
            and jax.default_backend() == "tpu")


def _w2d_wanted(cin, cout):
    """Width-to-depth packing is OPT-IN (STYLEMESH_W2D=1 packs the
    min(cin,cout)<=64 head, =all every cin/cout<=128 layer): measured on
    v5e it does NOT pay — conv1_2 packed is time-identical to plain
    (34.4 vs 34.6 ms f+b) despite 2x the FLOPs at full 128 lanes, and
    conv2_x/conv3_1 regress 0.5-0.86x (tools/w2d_probe.py,
    results/w2d_probe.json). The flop-invariance shows the shallow-layer
    cost is not MXU-lane occupancy; see RESULTS.md §3.2 for the full
    dead-end analysis. Kept because it is exact (1e-7 f32 parity) and the
    right building block if a future backend shifts the balance."""
    mode = os.environ.get("STYLEMESH_W2D", "0")
    if mode in ("0", ""):
        return False
    if mode == "all":
        return cin <= 128 and cout <= 128
    return min(cin, cout) <= 64


def _conv3x3(x, kernel, bias, precision):
    if os.environ.get("STYLEMESH_CONV_FLIPVJP", "1") != "0":
        return _conv3x3_flipvjp(x, kernel, bias, precision)
    # Pallas conv path (ops/conv_pallas.py): an im2col matmul with a
    # 9*Cin contraction. Measured on v5e it only MATCHES XLA's conv lowering
    # (tools/conv_kernel_check.py: 17.3 vs 18.8 ms fwd at 64ch, slightly
    # slower fwd+bwd) — the 64-lane output keeps the MXU half idle either
    # way — so it is opt-in (STYLEMESH_FAST_CONV=1) until the packed-pixel
    # variant lands. Gated to the exact trunk shape it implements (bf16,
    # DEFAULT precision, Cin >= 64 — a 3-wide minor dim can't DMA on Mosaic).
    if (x.dtype == jnp.bfloat16 and kernel.dtype == jnp.bfloat16
            and precision in (None, jax.lax.Precision.DEFAULT)
            and x.shape[-1] >= 64
            and os.environ.get("STYLEMESH_FAST_CONV", "0") == "1"):
        out = conv3x3_frozen(x, kernel, jax.default_backend() == "cpu")
        return out + bias.astype(out.dtype)
    # No preferred_element_type: for bf16 inputs the MXU accumulates in fp32
    # internally and a f32-preferred output breaks the conv transpose rule
    # (f32 cotangent vs bf16 kernel); for f32 inputs the output is f32 anyway.
    out = jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )
    return out + bias.astype(out.dtype)


def _maxpool2_raw(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


@jax.custom_vjp
def _maxpool2_fastvjp(x):
    """2x2/2 max pool whose backward avoids XLA's SelectAndScatter.

    SelectAndScatter costs ~2x the whole pool forward on TPU; the VJP here
    recomputes the argmax as "first window element equal to the max" (exactly
    torch MaxPool2d's tie rule — its scan keeps the first strict maximum) and
    routes the cotangent with elementwise ops only.
    """
    return _maxpool2_raw(x)


def _maxpool2(x):
    # A/B on v5e (tools/vgg_anatomy.py): trunk f+b 86.2 ms with
    # SelectAndScatter vs 108.7 ms with the elementwise VJP — the stack +
    # transpose interleave costs more than SAS saves, so SAS stays the
    # default and the custom VJP is opt-in for future revisits.
    if os.environ.get("STYLEMESH_FAST_POOL", "0") == "1":
        return _maxpool2_fastvjp(x)
    return _maxpool2_raw(x)


def _maxpool2_fwd(x):
    y = _maxpool2_raw(x)
    return y, (x, y)


def _maxpool2_bwd(res, g):
    x, y = res
    b, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xe = x[:, :h2 * 2, :w2 * 2, :].reshape(b, h2, 2, w2, 2, c)
    quads = [xe[:, :, dy, :, dx, :] for dy in range(2) for dx in range(2)]
    firsts = []
    none_before = None
    for q in quads:
        m = (q == y).astype(g.dtype)
        firsts.append(m if none_before is None else m * none_before)
        none_before = (1.0 - m) if none_before is None else none_before * (1.0 - m)
    dq = jnp.stack([f * g for f in firsts], axis=3)  # [b,h2,w2,4,c]
    dxe = dq.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    dx = dxe.reshape(b, h2 * 2, w2 * 2, c)
    if h2 * 2 != h or w2 * 2 != w:
        dx = jnp.pad(dx, ((0, 0), (0, h - h2 * 2), (0, w - w2 * 2), (0, 0)))
    return (dx,)


_maxpool2_fastvjp.defvjp(_maxpool2_fwd, _maxpool2_bwd)


def _avgpool2(x):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )
    return s * 0.25


def vgg_features(params, x, out_keys, pool="max", compute_dtype=None,
                 precision=jax.lax.Precision.HIGHEST):
    """Run the VGG-16 trunk and return the requested activations.

    Args:
        params: dict pytree from :func:`load_vgg_params` / :func:`init_vgg_params`.
        x: ``[B, H, W, 3]`` Gatys-preprocessed image (BGR, mean-sub, 0..255).
        out_keys: iterable of activation names (see :data:`VGG_LAYER_CHANNELS`).
        pool: ``'max'`` (reference default) or ``'avg'``.
        compute_dtype: cast inputs/weights to this dtype (e.g. ``jnp.bfloat16``
            for MXU speed); ``None`` keeps the input dtype. Accumulation is
            fp32 either way.
        precision: conv precision; HIGHEST pins fp32 math for parity tests,
            DEFAULT lets the platform use fast bf16 passes.
    Returns:
        dict name -> ``[B, h, w, c]`` activation (in compute dtype).
    """
    out_keys = list(out_keys)
    wanted = set(out_keys)
    # stop as soon as the deepest requested activation is produced
    last_needed = max(i for i, (name, _) in enumerate(_TRUNK) if name in wanted)

    # The VGG is frozen everywhere in this framework (as in the reference);
    # the fast flip-kernel VJP below returns ZERO weight/bias cotangents.
    # stop_gradient here makes that the contract of vgg_features itself:
    # param cotangents are zero under EVERY conv path (flip VJP, XLA auto
    # VJP, Pallas), not just the default one — so flipping the env toggles
    # can never silently turn "frozen" into "trainable".
    params = jax.lax.stop_gradient(params)

    if compute_dtype is not None:
        x = x.astype(compute_dtype)
    pool_fn = _maxpool2 if pool == "max" else _avgpool2

    # Fused conv+bias+relu VJP (single residual, see _conv3x3_relu_flipvjp)
    # is the default whenever the flip VJP itself is on; STYLEMESH_FUSED_RELU=0
    # falls back to separate relu (for A/B and VJP-path parity tests).
    fused_relu = (os.environ.get("STYLEMESH_CONV_FLIPVJP", "1") != "0"
                  and os.environ.get("STYLEMESH_FUSED_RELU", "1") != "0")

    outs = {}
    h = x
    skip_pool = False
    for i, (name, conv) in enumerate(_TRUNK):
        if conv is not None:
            k = params[conv]["kernel"]
            b = params[conv]["bias"]
            if compute_dtype is not None:
                k = k.astype(compute_dtype)
            # block-tail fusion: this conv feeds straight into a pool and
            # nobody reads its activation -> one fused Pallas kernel for
            # conv+bias+relu+maxpool, skipping the pool step below. The
            # fused output IS the pool's output, recorded under the pool's
            # name when requested.
            next_is_pool = (i + 1 < len(_TRUNK) and _TRUNK[i + 1][1] is None
                            and i + 1 <= last_needed)
            if (next_is_pool
                    and _fused_pool_wanted(h, k, precision, fused_relu, pool,
                                           name in wanted)):
                h = _conv_relu_pool_frozen(h, k, b.astype(jnp.float32), False)
                skip_pool = True
                continue  # `name` (the conv activation) was not wanted
            if _im2col_wanted(h, k, precision, fused_relu):
                h = conv3x3_im2col(h, k, b, relu=True)
            elif _w2d_wanted(h.shape[-1], k.shape[-1]):
                if fused_relu:
                    h = w2d_conv3x3(h, k, b, precision, relu=True)
                else:
                    h = jax.nn.relu(w2d_conv3x3(h, k, b, precision))
            elif _v2_wanted(h, k, precision, fused_relu):
                h = _conv3x3_relu_v2(h, k, b.astype(jnp.float32), False)
            elif fused_relu:
                h = _conv3x3_relu_flipvjp(h, k, b, precision)
            else:
                h = jax.nn.relu(_conv3x3(h, k, b, precision))
        else:
            if skip_pool:
                skip_pool = False
            else:
                h = pool_fn(h)
        if name in wanted:
            outs[name] = h
        if i == last_needed:
            break
    return {k: outs[k] for k in out_keys}
