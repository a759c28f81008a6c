"""Fused conv3x3 + bias + relu + maxpool2 Pallas kernel (the VGG trunk's
"block tail": conv1_2+pool1, conv2_2+pool2).

Why this exists (round-5 measurements, tools/conv_variants_probe.py +
results/conv_wall.json): the trunk head is memory-bound, not MXU-bound —
conv1_2 at level-3 takes 12.8 ms of which ~6 ms is pack/pad/unpack wrapper
HBM copies and only 2.5 ms is matmul-ideal; every kernel-internal
reformulation (no-copy 3D dots, single-K=1152 matmul, f32 scratch acc,
tile sweeps) lands within noise of 6.8-7.3 ms. The remaining lever is to
STOP ROUND-TRIPPING HBM: this kernel reads the block input once, computes
conv+bias+relu in VMEM, max-pools in-register, and writes only the pooled
map — eliminating the conv output write+read (~840 MB at level 3), the
separate pool pass, and all wrapper copies.

Layout tricks (see ops/conv_pallas.py for the base im2col kernel):
- 64-channel inputs ride as PACKED width pairs: an HBM ``[V, H, W, 64]``
  array IS ``[V, H, W//2, 128]`` (free view — contiguous minor dims), so a
  64->64 conv becomes a full-lane 128->128 conv with the phase-block kernel
  (models/vgg.py::pack_w2d_kernel). The odd-width tail column never
  survives pooling (floor(W/2) output cols), so the view's lost column is
  exactly the pooled-away one.
- maxpool2 in packed space is free-ish: width pairs are the two 64-lane
  halves of one register (``max(t[..., :64], t[..., 64:])``), row pairs a
  major-dim reshape.
- 128-channel inputs run unpacked; their column pool is one sublane-pair
  reshape on the (already bf16-cast) conv output tile.

Numerics: bf16 in / bf16 out, fp32 MXU accumulation, relu and the cast
applied before pooling — bit-identical to the reference composition
``maxpool2(relu(conv3x3_bf16(x)))`` (gated in tests/test_head_pallas.py).

Reference semantics: VGG block tails in
/root/reference/model/losses/content_and_style_losses.py:47-70 (conv ->
relu -> MaxPool2d); only fused, never changed.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_out_tile(h2, w2):
    """Output-tile (rows, cols) pick: target ~112x112 input-pixel tiles
    (the conv_variants_probe optimum), shrunk to the smallest multiple of 8
    that still covers (h2, w2) in the same tile counts."""
    th0 = 56 if h2 >= 56 else max(8, -(-h2 // 8) * 8)
    tw0 = 112 if w2 >= 112 else max(8, -(-w2 // 8) * 8)
    nh = -(-h2 // th0)
    nw = -(-w2 // tw0)
    th = -(-(-(-h2 // nh)) // 8) * 8
    tw = -(-(-(-w2 // nw)) // 8) * 8
    return th, tw, nh, nw


def _kernel_packed(th, tw, nh, nw,
                   x_hbm, w_ref, b_ref, out_ref, in_buf, col, sems):
    """64-ch packed path. Grid (V, nh, nw) over the POOLED output.

    x_hbm: packed view [V, Hp, Wp, 128] (Hp = 2*th*nh + 2 rows incl halo
    pad, Wp = tw*nw + 8 packed cols incl left halo pad).
    Output tile: [th, tw, 64] pooled rows/cols.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    linear = (b * nh + i) * nw + j
    n_total = pl.num_programs(0) * nh * nw

    def start_load(lin, slot):
        bb = lin // (nh * nw)
        ii = (lin // nw) % nh
        jj = lin % nw
        # rows: 2*th input rows + 2 halo; packed cols: tw + 8 (left halo
        # lands at packed col 7 of the buffer — the wrapper pads 8 packed
        # zero-cols on the left so DMA starts stay 8-aligned)
        return pltpu.make_async_copy(
            x_hbm.at[bb, pl.ds(ii * 2 * th, 2 * th + 2),
                     pl.ds(jj * tw, tw + 16), :],
            in_buf.at[slot], sems.at[slot])

    @pl.when(linear == 0)
    def _():
        start_load(0, 0).start()

    @pl.when(linear + 1 < n_total)
    def _():
        start_load(linear + 1, (linear + 1) % 2).start()

    slot = linear % 2
    start_load(linear, slot).wait()

    # packed-space im2col: 3 packed-col shifts (halo packed col = buffer
    # col 7, so shifts are 7+dx like the base kernel)
    for dx in range(3):
        col[:, :, dx * 128:(dx + 1) * 128] = in_buf[slot, :, 7 + dx:7 + dx + tw, :]

    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            col[dy:dy + 2 * th, :, :].reshape(2 * th * tw, 3 * 128),
            w_ref[dy * 3 * 128:(dy + 1) * 3 * 128, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc + b_ref[0][None, :]
    r = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)  # bf16 BEFORE pool (parity)
    r = r.reshape(th, 2, tw, 128)
    r = jnp.max(r, axis=1)                     # row pairs
    out_ref[0] = jnp.maximum(r[:, :, :64], r[:, :, 64:])  # packed col pairs


def _kernel_direct(th, tw, nh, nw,
                   x_hbm, w_ref, b_ref, out_ref, in_buf, col, sems):
    """128-ch direct path: input [V, H, W, 128]; output tile [th, tw, 128]
    pooled. Input tile: [2*th + 2, 2*tw + 16, 128]."""
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
            x_hbm.at[bb, pl.ds(ii * 2 * th, 2 * th + 2),
                     pl.ds(jj * 2 * tw, 2 * tw + 16), :],
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
        col[:, :, dx * 128:(dx + 1) * 128] = (
            in_buf[slot, :, 7 + dx:7 + dx + 2 * tw, :])

    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            col[dy:dy + 2 * th, :, :].reshape(2 * th * 2 * tw, 3 * 128),
            w_ref[dy * 3 * 128:(dy + 1) * 3 * 128, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc + b_ref[0][None, :]
    r = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
    r = r.reshape(th, 2, 2 * tw, 128)
    r = jnp.max(r, axis=1)                     # row pairs
    r = r.reshape(th, tw, 2, 128)              # sublane-pair split (relayout)
    out_ref[0] = jnp.max(r, axis=2)            # col pairs


def _kernel_direct_dual(th, tw, nh, nw,
                        x_hbm, w_ref, b_ref, out_ref, pre_ref,
                        in_buf, col, sems):
    """128-ch direct path emitting BOTH the pooled map and the pre-pool
    conv+relu activation. The extra write costs one activation-sized HBM
    pass; the custom VJP then reuses it instead of recomputing the conv in
    the backward (the composed recompute cost more than the forward fusion
    saved — measured as a net step regression in the round-5 flag A/B)."""
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
            x_hbm.at[bb, pl.ds(ii * 2 * th, 2 * th + 2),
                     pl.ds(jj * 2 * tw, 2 * tw + 16), :],
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
        col[:, :, dx * 128:(dx + 1) * 128] = (
            in_buf[slot, :, 7 + dx:7 + dx + 2 * tw, :])

    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            col[dy:dy + 2 * th, :, :].reshape(2 * th * 2 * tw, 3 * 128),
            w_ref[dy * 3 * 128:(dy + 1) * 3 * 128, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    acc = acc + b_ref[0][None, :]
    r = jnp.maximum(acc, 0.0).astype(jnp.bfloat16)
    r = r.reshape(2 * th, 2 * tw, 128)
    pre_ref[0] = r
    r2 = r.reshape(th, 2, 2 * tw, 128)
    r2 = jnp.max(r2, axis=1)
    r2 = r2.reshape(th, tw, 2, 128)
    out_ref[0] = jnp.max(r2, axis=2)


def conv_relu_pool_dual(x, w, bias, interpret=False):
    """128-ch fused block tail returning ``(pooled, pre_pool)`` — the
    pre-pool conv+relu activation doubles as the backward's residual."""
    v, h, wdt, c = x.shape
    assert c == 128, c
    h2, w2 = h // 2, wdt // 2
    x = x.astype(jnp.bfloat16)
    th, tw, nh, nw = _pick_out_tile(h2, w2)
    xp = jnp.pad(x, ((0, 0), (1, 2 * th * nh - h + 1),
                     (8, 2 * tw * nw - wdt + 8), (0, 0)))
    wf = w.astype(jnp.bfloat16).reshape(9 * 128, 128)
    bf = bias.astype(jnp.float32).reshape(1, 128)
    kernel = functools.partial(_kernel_direct_dual, th, tw, nh, nw)
    out, pre = pl.pallas_call(
        kernel,
        grid=(v, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * 128, 128), lambda b, i, j: (0, 0)),
            pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, th, tw, 128), lambda b, i, j: (b, i, j, 0)),
            pl.BlockSpec((1, 2 * th, 2 * tw, 128),
                         lambda b, i, j: (b, i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((v, th * nh, tw * nw, 128), jnp.bfloat16),
            jax.ShapeDtypeStruct((v, 2 * th * nh, 2 * tw * nw, 128),
                                 jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 2, 2 * tw + 16, 128), jnp.bfloat16),
            pltpu.VMEM((2 * th + 2, 2 * tw, 3 * 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, wf, bf)
    return out[:, :h2, :w2, :], pre[:, :h, :wdt, :]


def _kernel_packed_bwd(th, tw, nh, nw,
                       x_hbm, g_hbm, w_ref, kt_ref, b_ref, out_ref,
                       x_buf, g_buf, col1, col2, xsems, gsems):
    """64-ch packed block-tail BACKWARD: one kernel for
    d(pool(relu(conv(x)+b)))/dx given the pooled cotangent g.

    Per pooled-output tile (th, tw packed cols): recompute the conv+relu
    activation r on a 1-ring-expanded region from x (same contraction
    split as the forward kernel -> bit-identical r -> identical argmax
    routing), route g through the pool's first-max rule and the relu mask,
    then apply the transposed conv (flip+io-swap packed kernel) — reading
    x and g once and writing only dx. No r/dr HBM round trips.

    Region bookkeeping (packed-col coords relative to the tile):
      dx rows [0, 2th) cols [0, tw)   <- dr rows [-1, 2th+1) cols [-1, tw+1)
      dr  <- g rows [-1, th+1) cols [-1, tw+1)  and r on the same region
      r rows [-2, 2th+2) cols [-1, tw+1) <- x rows [-3, 2th+3) cols [-2, tw+2)
    The wrapper pads x 3 rows top / 8 packed cols left, g 1 row top / 8
    cols left, so all DMA starts stay aligned.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    linear = (b * nh + i) * nw + j
    n_total = pl.num_programs(0) * nh * nw

    def loads(lin, slot):
        bb = lin // (nh * nw)
        ii = (lin // nw) % nh
        jj = lin % nw
        return (
            pltpu.make_async_copy(
                x_hbm.at[bb, pl.ds(ii * 2 * th, 2 * th + 6),
                         pl.ds(jj * tw, tw + 16), :],
                x_buf.at[slot], xsems.at[slot]),
            pltpu.make_async_copy(
                g_hbm.at[bb, pl.ds(ii * th, th + 2),
                         pl.ds(jj * tw, tw + 16), :],
                g_buf.at[slot], gsems.at[slot]),
        )

    @pl.when(linear == 0)
    def _():
        for c in loads(0, 0):
            c.start()

    @pl.when(linear + 1 < n_total)
    def _():
        for c in loads(linear + 1, (linear + 1) % 2):
            c.start()

    slot = linear % 2
    for c in loads(linear, slot):
        c.wait()

    # ---- recompute r = relu(conv(x)+b) on rows [-2, 2th+2), cols [-1, tw+1)
    # x buffer col 8 == packed col 0, so conv input col (q-1+dx) for output
    # col index q_idx (= q+1, q in [-1, tw+1)) sits at buffer col q_idx+6+dx.
    for dx in range(3):
        col1[:, :, dx * 128:(dx + 1) * 128] = (
            x_buf[slot, :, 6 + dx:6 + dx + tw + 2, :])
    acc = None
    for dy in range(3):
        part = jax.lax.dot_general(
            col1[dy:dy + 2 * th + 4, :, :].reshape((2 * th + 4) * (tw + 2),
                                                   3 * 128),
            w_ref[dy * 3 * 128:(dy + 1) * 3 * 128, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    r = jnp.maximum(acc + b_ref[0][None, :], 0.0).astype(jnp.bfloat16)
    r = r.reshape(th + 2, 2, tw + 2, 128)

    # ---- pool backward: first-max routing in (row, col) raster order,
    # relu mask folded in (a routed-to zero activation gets no gradient)
    # comparisons run in f32: Mosaic/v5e has no bf16 cmpf ("Target does not
    # support this comparison"), and bf16->f32 is exact so the routing is
    # bit-identical to comparing the bf16 activations directly
    a = r[:, 0, :, :64].astype(jnp.float32)
    bq = r[:, 0, :, 64:].astype(jnp.float32)
    c2 = r[:, 1, :, :64].astype(jnp.float32)
    d = r[:, 1, :, 64:].astype(jnp.float32)
    p = jnp.maximum(jnp.maximum(a, bq), jnp.maximum(c2, d))
    ma = (a == p) & (a > 0)
    mb = (bq == p) & (bq > 0) & ~ma
    mc = (c2 == p) & (c2 > 0) & ~ma & ~mb
    md = (d == p) & (d > 0) & ~ma & ~mb & ~mc
    one = jnp.ones((), jnp.bfloat16)
    zero = jnp.zeros((), jnp.bfloat16)
    ia = jnp.where(ma, one, zero)
    ib = jnp.where(mb, one, zero)
    ic = jnp.where(mc, one, zero)
    idd = jnp.where(md, one, zero)
    # g rides lane-DUPLICATED ([g|g], 128 lanes): Mosaic requires manual
    # HBM DMA slices to be 128-aligned on the minor dim, so a 64-lane gp
    # cannot be window-copied (the round-5 mfu_probe/bench Mosaic failure:
    # "Slice shape along dimension 3 must be aligned to tiling (128), but
    # is 64"). The duplicate halves also line up with the packed-dr lane
    # layout, so routing is one multiply against the concatenated masks.
    gs = g_buf[slot, :, 7:7 + tw + 2, :]  # cols [-1, tw+1), [g|g] lanes
    row0 = gs * jnp.concatenate([ia, ib], axis=-1)
    row1 = gs * jnp.concatenate([ic, idd], axis=-1)
    dr = jnp.stack([row0, row1], axis=1).reshape(2 * th + 4, tw + 2, 128)

    # ---- transposed conv: dx[s, q] = sum_dy,dx dr[s-1+dy, q-1+dx] ktp
    for dx in range(3):
        col2[:, :, dx * 128:(dx + 1) * 128] = dr[:, dx:dx + tw, :]
    acc = None
    for dy in range(3):
        # dr block row 0 is tile row -2, so dx row s reads dr rows
        # s-1+dy -> block index s+1+dy
        part = jax.lax.dot_general(
            col2[dy + 1:dy + 1 + 2 * th, :, :].reshape(2 * th * tw, 3 * 128),
            kt_ref[dy * 3 * 128:(dy + 1) * 3 * 128, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    out_ref[0] = acc.reshape(2 * th, tw, 128).astype(out_ref.dtype)


def conv_relu_pool_bwd(x, w, bias, g, interpret=False):
    """Input gradient of :func:`conv_relu_pool` (64-ch packed path only) as
    one fused Pallas kernel. ``g``: ``[V, H//2, W//2, C]`` cotangent.
    Returns ``dx [V, H, W, C]`` bf16."""
    v, h, wdt, c = x.shape
    assert c == 64, c
    h2, w2 = h // 2, wdt // 2
    x = x.astype(jnp.bfloat16)
    g = g.astype(jnp.bfloat16)
    # grid over CEIL half-sizes: odd-tail rows/cols receive gradient (they
    # feed the last kept conv output as halo) even though they never appear
    # in the pooled output — the g padding is zero there, so the extra
    # windows route nothing but the transposed conv still covers the tail.
    th, tw, nh, nw = _pick_out_tile(-(-h // 2), -(-wdt // 2))

    xp = jnp.pad(x, ((0, 0), (3, 2 * th * nh - h + 3),
                     (16, 2 * tw * nw + 16 - wdt), (0, 0)))
    xp = xp.reshape(v, xp.shape[1], tw * nw + 16, 128)
    # lane-duplicate g to 128 (see the routing comment in the kernel: 64-lane
    # HBM arrays cannot be manually window-DMA'd)
    gp = jnp.pad(jnp.concatenate([g, g], axis=-1),
                 ((0, 0), (1, th * nh - h2 + 1),
                  (8, tw * nw + 16 - w2 - 8), (0, 0)))
    w2d = _pack_w2d(w.astype(jnp.bfloat16)).reshape(9 * 128, 128)
    kt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    kt2d = _pack_w2d(kt.astype(jnp.bfloat16)).reshape(9 * 128, 128)
    b2 = jnp.concatenate([bias, bias]).astype(jnp.float32).reshape(1, 128)

    kernel = functools.partial(_kernel_packed_bwd, th, tw, nh, nw)
    out = pl.pallas_call(
        kernel,
        grid=(v, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * 128, 128), lambda b, i, j: (0, 0)),
            pl.BlockSpec((9 * 128, 128), lambda b, i, j: (0, 0)),
            pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, tw, 128),
                               lambda b, i, j: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((v, 2 * th * nh, tw * nw, 128),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 6, tw + 16, 128), jnp.bfloat16),
            pltpu.VMEM((2, th + 2, tw + 16, 128), jnp.bfloat16),
            pltpu.VMEM((2 * th + 6, tw + 2, 3 * 128), jnp.bfloat16),
            pltpu.VMEM((2 * th + 4, tw, 3 * 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(xp, gp, w2d, kt2d, b2)
    dx = out.reshape(v, 2 * th * nh, 2 * tw * nw, 64)
    return dx[:, :h, :wdt, :]


def _pack_w2d(kernel):
    """[3,3,C,D] -> [3,3,2C,2D] phase-block kernel (twin of
    models/vgg.py::pack_w2d_kernel, duplicated against an import cycle)."""
    kh, _, c, d = kernel.shape
    kp = jnp.zeros((kh, 3, 2 * c, 2 * d), kernel.dtype)
    kp = kp.at[:, 0, c:, :d].set(kernel[:, 0])
    kp = kp.at[:, 1, :c, :d].set(kernel[:, 1])
    kp = kp.at[:, 1, c:, :d].set(kernel[:, 2])
    kp = kp.at[:, 1, :c, d:].set(kernel[:, 0])
    kp = kp.at[:, 1, c:, d:].set(kernel[:, 1])
    kp = kp.at[:, 2, :c, d:].set(kernel[:, 2])
    return kp


def conv_relu_pool(x, w, bias, interpret=False):
    """Fused ``maxpool2(relu(conv3x3_same(x, w) + bias))``.

    Args:
        x: ``[V, H, W, C]`` bf16, C in {64, 128}.
        w: ``[3, 3, C, C]`` HWIO (C == Cout — the VGG block-tail shape).
        bias: ``[C]``.
    Returns:
        ``[V, H//2, W//2, C]`` bf16.
    """
    v, h, wdt, c = x.shape
    assert w.shape == (3, 3, c, c), (w.shape, c)
    h2, w2 = h // 2, wdt // 2
    x = x.astype(jnp.bfloat16)
    th, tw, nh, nw = _pick_out_tile(h2, w2)

    if c == 64:
        # packed view: [V, H, W, 64] == [V, H, W//2, 128] (free for the
        # contiguous minor dims). Pad halos + grid in REAL cols first (one
        # copy, same as the base conv kernel's pad), THEN view packed: a
        # left pad of 16 real = 8 packed cols keeps DMA starts 8-aligned,
        # and an odd trailing column stays in place as a conv halo — it
        # feeds the last kept conv column even though it never survives
        # pooling itself.
        xp = jnp.pad(x, ((0, 0), (1, 2 * th * nh - h + 1),
                         (16, 2 * tw * nw + 16 - wdt), (0, 0)))
        xp = xp.reshape(v, xp.shape[1], tw * nw + 16, 128)
        w2d = _pack_w2d(w.astype(jnp.bfloat16)).reshape(9 * 128, 128)
        b2 = jnp.concatenate([bias, bias]).astype(jnp.float32).reshape(1, 128)
        kernel = functools.partial(_kernel_packed, th, tw, nh, nw)
        out = pl.pallas_call(
            kernel,
            grid=(v, nh, nw),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((9 * 128, 128), lambda b, i, j: (0, 0)),
                pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, tw, 64),
                                   lambda b, i, j: (b, i, j, 0)),
            out_shape=jax.ShapeDtypeStruct((v, th * nh, tw * nw, 64),
                                           jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, 2 * th + 2, tw + 16, 128), jnp.bfloat16),
                pltpu.VMEM((2 * th + 2, tw, 3 * 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(xp, w2d, b2)
        return out[:, :h2, :w2, :]

    assert c == 128, c
    xp = jnp.pad(x, ((0, 0), (1, 2 * th * nh - h + 1),
                     (8, 2 * tw * nw - wdt + 8), (0, 0)))
    wf = w.astype(jnp.bfloat16).reshape(9 * 128, 128)
    bf = bias.astype(jnp.float32).reshape(1, 128)
    kernel = functools.partial(_kernel_direct, th, tw, nh, nw)
    out = pl.pallas_call(
        kernel,
        grid=(v, nh, nw),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((9 * 128, 128), lambda b, i, j: (0, 0)),
            pl.BlockSpec((1, 128), lambda b, i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, tw, 128),
                               lambda b, i, j: (b, i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((v, th * nh, tw * nw, 128),
                                       jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 2 * th + 2, 2 * tw + 16, 128), jnp.bfloat16),
            pltpu.VMEM((2 * th + 2, 2 * tw, 3 * 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xp, wf, bf)
    return out[:, :h2, :w2, :]
