"""Pallas TPU kernel: fused multi-mask Gram accumulation + its VJP.

The style loss computes, per (pyramid level, VGG layer), up to two masked
Grams over the same feature map (angle-passed and angle-failed pixel sets —
reference ContentAndStyleLoss, content_and_style_losses.py:305-338). In XLA
this lowers to per-variant ``F*m`` materializations, layout copies around the
tall-skinny einsum, and the same again (plus saved residuals) in the
backward — measured ~150 ms of a 471 ms step at V=4 (tools/loss_anatomy.py).

This kernel reads each feature tile once and accumulates ALL mask variants'
Grams in VMEM:

    G[v, k] = sum_p m_k[v, p] * f[v, p] f[v, p]^T    (raw sums; the caller
                                                      divides by the counts)

Matmul orientation matters: contracting over the pixel (sublane) axis of two
``[R, C]`` operands makes Mosaic transpose one of them per chunk (~2x cost).
Instead each chunk does ONE explicit transpose ``ft = f^T`` and then runs
only standard ``lhs[., K] @ rhs[K, .]`` forms:

    fwd:  G_k   = (ft * m_k-row) @ f          [C, R] @ [R, C]
    bwd:  dF^T  = sum_k (S_k @ ft) * m_k-row  [C, C] @ [C, R], then one
          transpose back per chunk; S_k = dG_k + dG_k^T.

The row orientation also makes the mask trivial: masks stay in their natural
``[V, K, P]`` pixel-minor layout (:func:`stack_masks` pads + leads with V), and each
chunk's ``[K, R]`` slice broadcasts over sublanes natively.

Dtypes mirror :func:`stylemesh_tpu.ops.gram.masked_gram`'s bf16 path: bf16
operands into the MXU, fp32 accumulation (bf16 products are exact in the
fp32 accumulator). The caller gates usage to the bf16 pipeline;
f32/HIGHEST parity runs stay on the XLA einsum.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096  # pixels per chunk — large so per-chunk overhead amortizes
# features below this pixel count stay on the XLA einsum: their gram cost is
# negligible and the R-padding would dominate
MIN_PX = int(os.environ.get("STYLEMESH_GRAM_MIN_PX", "50000"))


def stack_masks(masks):
    """``[K, V, P]`` (or [K, V, H, W]) 0/1 masks -> ``[V, K, P_pad]`` bf16,
    P padded to a multiple of R; padding pixels get mask 0 (they contribute
    nothing regardless of the feature padding's content). The view axis
    leads so the kernels' per-view slice is a major-dim (untiled) index."""
    k, v = masks.shape[:2]
    m = masks.reshape(k, v, -1).astype(jnp.bfloat16)
    p = m.shape[-1]
    m = jnp.pad(m, ((0, 0), (0, 0), (0, (-p) % R)))
    return m.transpose(1, 0, 2)


def pad_features(f):
    """``[V, H, W, C] -> [V, P_pad, C_pad]`` bf16: P padded to a multiple of
    R and C padded to the 128-lane tile (Mosaic HBM slices must cover whole
    lane tiles; zero channels add zero Gram rows/cols, sliced off by
    :func:`fused_masked_grams`)."""
    v, h, w, c = f.shape
    p = h * w
    flat = f.reshape(v, p, c).astype(jnp.bfloat16)
    pad = (-p) % R
    cpad = (-c) % 128
    if pad or cpad:
        flat = jnp.pad(flat, ((0, 0), (0, pad), (0, cpad)))
    return flat


def fused_masked_grams(f, masks_p, interpret=False):
    """``[V, H, W, C]`` features + padded masks -> raw Gram sums
    ``[V, K, C, C]`` via the kernel, with channel padding handled."""
    c = f.shape[-1]
    sums = masked_gram_sums(pad_features(f), masks_p, interpret)
    return sums[:, :, :c, :c]


def _load_f(f_hbm, f_buf, sems, nch, lin, slot):
    vv = lin // nch
    cc = lin % nch
    return pltpu.make_async_copy(
        f_hbm.at[vv, pl.ds(cc * R, R), :], f_buf.at[slot], sems.at[slot])


def _gram_kernel(nch, k_masks, cin, f_hbm, m_hbm, out_ref,
                 f_buf, m_buf, acc, sems, msem):
    vi = pl.program_id(0)
    ch = pl.program_id(1)
    linear = vi * nch + ch
    n_total = pl.num_programs(0) * nch

    @pl.when(linear == 0)
    def _():
        _load_f(f_hbm, f_buf, sems, nch, 0, 0).start()

    @pl.when(linear + 1 < n_total)
    def _():
        _load_f(f_hbm, f_buf, sems, nch, linear + 1, (linear + 1) % 2).start()

    # per-chunk [K, R] mask rows (16KB — waited inline)
    mcp = pltpu.make_async_copy(
        m_hbm.at[vi, :, pl.ds(ch * R, R)], m_buf, msem)
    mcp.start()
    mcp.wait()

    slot = linear % 2
    _load_f(f_hbm, f_buf, sems, nch, linear, slot).wait()

    @pl.when(ch == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    f = f_buf[slot]  # [R, C] bf16
    ft = f.T  # [C, R] — the chunk's one explicit transpose
    for k in range(k_masks):
        fm_t = ft * m_buf[k][None, :]  # [C, R] * [1, R] row broadcast
        g = jax.lax.dot_general(
            fm_t, f, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc[k] = acc[k] + g

    @pl.when(ch == nch - 1)
    def _():
        out_ref[0] = acc[...]


def _grams_fwd_pallas(f, masks_p, interpret=False):
    v, p, c = f.shape
    k = masks_p.shape[1]
    assert p % R == 0, p
    nch = p // R
    assert masks_p.shape[-1] >= p, (masks_p.shape, p)
    kernel = functools.partial(_gram_kernel, nch, k, c)
    return pl.pallas_call(
        kernel,
        grid=(v, nch),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, k, c, c), lambda vi, ch: (vi, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((v, k, c, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, R, c), jnp.bfloat16),
            pltpu.VMEM((k, R), jnp.bfloat16),
            pltpu.VMEM((k, c, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f.astype(jnp.bfloat16), masks_p)


def _gram_bwd_kernel(nch, k_masks, cin, f_hbm, m_hbm, s_hbm, df_ref,
                     f_buf, m_buf, s_buf, sems, msem, ssem):
    vi = pl.program_id(0)
    ch = pl.program_id(1)
    linear = vi * nch + ch
    n_total = pl.num_programs(0) * nch

    @pl.when(linear == 0)
    def _():
        _load_f(f_hbm, f_buf, sems, nch, 0, 0).start()

    @pl.when(linear + 1 < n_total)
    def _():
        _load_f(f_hbm, f_buf, sems, nch, linear + 1, (linear + 1) % 2).start()

    @pl.when(ch == 0)
    def _():
        cp = pltpu.make_async_copy(s_hbm.at[vi], s_buf, ssem)
        cp.start()
        cp.wait()

    mcp = pltpu.make_async_copy(
        m_hbm.at[vi, :, pl.ds(ch * R, R)], m_buf, msem)
    mcp.start()
    mcp.wait()

    slot = linear % 2
    _load_f(f_hbm, f_buf, sems, nch, linear, slot).wait()

    f = f_buf[slot]  # [R, C] bf16
    ft = f.T  # [C, R]
    acc_t = jnp.zeros((cin, R), jnp.float32)
    for k in range(k_masks):
        fs_t = jax.lax.dot_general(
            s_buf[k], ft, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [C, R] = S_k @ f^T
        acc_t = acc_t + fs_t * m_buf[k][None, :].astype(jnp.float32)
    df_ref[0] = acc_t.T.astype(jnp.bfloat16)


def _grams_bwd_pallas(f, masks_p, s, interpret=False):
    """dF for the raw sums; ``s = dG + dG^T`` per (view, mask). bf16 out."""
    v, p, c = f.shape
    k = masks_p.shape[1]
    nch = p // R
    kernel = functools.partial(_gram_bwd_kernel, nch, k, c)
    out = pl.pallas_call(
        kernel,
        grid=(v, nch),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, R, c), lambda vi, ch: (vi * nch + ch, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((v * nch, R, c), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, R, c), jnp.bfloat16),
            pltpu.VMEM((k, R), jnp.bfloat16),
            pltpu.VMEM((k, c, c), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(f.astype(jnp.bfloat16), masks_p, s.astype(jnp.bfloat16))
    return out.reshape(v, p, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def masked_gram_sums(f, masks_p, interpret=False):
    """Raw masked Gram sums ``[V, K, C, C]`` fp32 over ``f: [V, P, C]``.

    ``masks_p`` from :func:`stack_masks` (a batch constant — its cotangent
    is zeros by design). Divide by the per-mask pixel counts to match
    :func:`stylemesh_tpu.ops.gram.masked_gram`.
    """
    return _grams_fwd_pallas(f, masks_p, interpret=interpret)


def _mgs_fwd(f, masks_p, interpret):
    return _grams_fwd_pallas(f, masks_p, interpret=interpret), (f, masks_p)


def _mgs_bwd(interpret, res, dg):
    f, masks_p = res
    s = dg + jnp.swapaxes(dg, -1, -2)  # [V, K, C, C]
    df = _grams_bwd_pallas(f, masks_p, s, interpret=interpret)
    return df.astype(f.dtype), jnp.zeros_like(masks_p)


masked_gram_sums.defvjp(_mgs_fwd, _mgs_bwd)
