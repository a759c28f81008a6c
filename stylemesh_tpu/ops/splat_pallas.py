"""Pallas TPU kernel: tiled texture-gradient splat (scatter-add replacement).

The measured XLA scatter-add costs ~90ns per contribution on TPU (580ms for
one 2x784x1045 pyramid level into a 4096² atlas) and dominates the training
step. This kernel exploits two structural facts:

1. UV maps are smooth, so a TILE_H x TILE_W pixel tile's bilinear footprint
   almost always fits a small REGION_H x REGION_W texel window (planned
   host-side, :mod:`stylemesh_tpu.ops.splat_plan`).
2. Within a window, the 4-corner splat factorizes into row/column one-hot
   weight matrices, so the accumulation becomes an MXU matmul per channel:
   ``region[r, c] += sum_p rowW[r, p] * colW[c, p] * g[ch, p]``.

TPU layout notes: the atlas is processed channel-FIRST ``[3, H, W]`` — a
channel-minor ``[H, W, 3]`` HBM buffer tiles its 3-wide minor dim to 128
lanes (42x padding) and Mosaic rejects 3-wide DMA slices. Window origins are
aligned to the (8, 128) tile grid (the planner guarantees this). The atlas
stays in HBM; each (sequential) grid step DMAs its window into VMEM,
accumulates the tile's matmuls, and DMAs it back. Contributions outside the
window never match the local one-hot iota (weight 0) — exactly the set the
planner routes to the compact residual scatter.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stylemesh_tpu.ops.splat_plan import (
    REGION_H,
    REGION_W,
    TILE_H,
    TILE_PX,
    TILE_W,
)


def _splat_kernel(tex_h, tex_w, region_h, region_w,
                  oy_ref, ox_ref, uv_ref, g_ref, atlas_in_ref, atlas_ref,
                  region, sem_in, sem_out):
    del atlas_in_ref  # aliased with atlas_ref
    i = pl.program_id(0)
    # the planner aligns origins to the (8, 128) HBM tile grid; the hint lets
    # Mosaic prove the window DMA slice is tile-aligned. Origins ship as two
    # 1-D SMEM arrays (a [n, 2] operand pads its 2-wide dim to 128 lanes and
    # blows the 1MB SMEM budget at larger view batches).
    oy = pl.multiple_of(oy_ref[i], 8)
    ox = pl.multiple_of(ox_ref[i], 128)

    # fetch the window [3, RH, RW]
    load = pltpu.make_async_copy(
        atlas_ref.at[:, pl.ds(oy, region_h), pl.ds(ox, region_w)],
        region, sem_in)
    load.start()

    uv = uv_ref[0]  # [2, TILE_PX]
    g = g_ref[0]  # [3, TILE_PX]

    u = uv[0:1, :]  # [1, TILE_PX]
    v = uv[1:2, :]
    px = jnp.clip((u + 1.0) * 0.5 * (tex_w - 1), 0.0, tex_w - 1)
    py = jnp.clip((v + 1.0) * 0.5 * (tex_h - 1), 0.0, tex_h - 1)
    ix0 = jnp.floor(px).astype(jnp.int32)
    iy0 = jnp.floor(py).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, tex_w - 1)
    iy1 = jnp.minimum(iy0 + 1, tex_h - 1)
    wx1 = px - ix0.astype(jnp.float32)
    wy1 = py - iy0.astype(jnp.float32)

    # padded pixels (uv sentinel -10) contribute nothing; background pixels
    # (grid exactly (-1,-1) -> texel (0,0) with weight 1) are accumulated
    # analytically by the wrapper (dense masked sum), not here
    bg = jnp.logical_and(u == -1.0, v == -1.0)
    alive = jnp.logical_and(u > -5.0, jnp.logical_not(bg)).astype(jnp.float32)

    # one-hot weights [R, TILE_PX]; out-of-window local indices match no iota
    # slot — exactly the planner's residual set
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (region_h, TILE_PX), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (region_w, TILE_PX), 0)
    row_w = ((iota_r == (iy0 - oy)).astype(jnp.float32) * (1.0 - wy1)
             + (iota_r == (iy1 - oy)).astype(jnp.float32) * wy1)
    col_w = ((iota_c == (ix0 - ox)).astype(jnp.float32) * (1.0 - wx1)
             + (iota_c == (ix1 - ox)).astype(jnp.float32) * wx1)
    row_w = row_w * alive

    load.wait()

    for ch in range(3):
        a = row_w * g[ch:ch + 1, :]  # [RH, TILE_PX]
        # full-precision MXU passes: the default bf16 pass costs ~0.4%
        # relative error on accumulated gradients
        m = jax.lax.dot_general(
            a, col_w, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # [RH, RW]
        region[ch, :, :] = region[ch, :, :] + m

    store = pltpu.make_async_copy(
        region,
        atlas_ref.at[:, pl.ds(oy, region_h), pl.ds(ox, region_w)],
        sem_out)
    store.start()
    store.wait()


def _tile_batch_cfirst(x, fill):
    """[V, H, W, C] -> [V*n_tiles, C, TILE_PX] with constant padding."""
    v, h, w, c = x.shape
    ph = (-h) % TILE_H
    pw = (-w) % TILE_W
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=fill)
    hh, ww = h + ph, w + pw
    x = x.reshape(v, hh // TILE_H, TILE_H, ww // TILE_W, TILE_W, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [V, th, tw, C, TILE_H, TILE_W]
    return x.reshape(-1, c, TILE_PX)


@functools.partial(jax.jit, static_argnames=("tex_h", "tex_w", "region_h",
                                             "region_w", "interpret"))
def splat_pallas(g, uv, origins, tex_h, tex_w, region_h=None,
                 region_w=None, interpret=False):
    """Scatter-add 4-corner weighted pixel grads into a zeroed atlas.

    Args:
        g: ``[V, H, W, 3]`` pixel cotangents.
        uv: ``[V, H, W, 2]`` grids in [-1, 1] (x, y).
        origins: ``[V * n_tiles_per_view, 2]`` int32 window origins from the
            planner ((8, 128)-aligned, same tiling order as
            :func:`_tile_batch_cfirst`).
        tex_h/tex_w: atlas size; must be multiples of (8, 128) for the HBM
            window DMA (use the XLA scatter path otherwise).
    Returns:
        ``[tex_h, tex_w, 3]`` fp32 gradient (without the planner's residual
        contributions — the caller adds those with a small XLA scatter).
    """
    from stylemesh_tpu.ops.splat_plan import effective_region

    assert tex_h % 8 == 0 and tex_w % 128 == 0, (tex_h, tex_w)
    region_h, region_w = effective_region(tex_h, tex_w, region_h, region_w)
    g_tiles = _tile_batch_cfirst(g.astype(jnp.float32), 0.0)
    uv_tiles = _tile_batch_cfirst(uv.astype(jnp.float32), -10.0)
    n_tiles = g_tiles.shape[0]
    assert origins.shape[0] == n_tiles, (origins.shape, n_tiles)

    atlas_zero = jnp.zeros((3, tex_h, tex_w), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2, TILE_PX), lambda i, oy, ox: (i, 0, 0)),
            pl.BlockSpec((1, 3, TILE_PX), lambda i, oy, ox: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # atlas (aliased out)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((3, region_h, region_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    kernel = functools.partial(_splat_kernel, tex_h, tex_w, region_h, region_w)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, tex_h, tex_w), jnp.float32),
        input_output_aliases={4: 0},  # atlas input (after prefetch args) -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(origins[:, 0], origins[:, 1], uv_tiles, g_tiles, atlas_zero)
    return out.transpose(1, 2, 0)


def _gather_kernel(tex_h, tex_w, region_h, region_w,
                   oy_ref, ox_ref, uv_ref, atlas_ref, out_ref,
                   region, sem_in):
    i = pl.program_id(0)
    oy = pl.multiple_of(oy_ref[i], 8)
    ox = pl.multiple_of(ox_ref[i], 128)

    load = pltpu.make_async_copy(
        atlas_ref.at[:, pl.ds(oy, region_h), pl.ds(ox, region_w)],
        region, sem_in)
    load.start()

    uv = uv_ref[0]  # [2, TILE_PX]
    u = uv[0:1, :]
    v = uv[1:2, :]
    px = jnp.clip((u + 1.0) * 0.5 * (tex_w - 1), 0.0, tex_w - 1)
    py = jnp.clip((v + 1.0) * 0.5 * (tex_h - 1), 0.0, tex_h - 1)
    ix0 = jnp.floor(px).astype(jnp.int32)
    iy0 = jnp.floor(py).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, tex_w - 1)
    iy1 = jnp.minimum(iy0 + 1, tex_h - 1)
    wx1 = px - ix0.astype(jnp.float32)
    wy1 = py - iy0.astype(jnp.float32)

    bg = jnp.logical_and(u == -1.0, v == -1.0)
    alive = jnp.logical_and(u > -5.0, jnp.logical_not(bg)).astype(jnp.float32)

    iota_r = jax.lax.broadcasted_iota(jnp.int32, (region_h, TILE_PX), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (region_w, TILE_PX), 0)
    row_w = ((iota_r == (iy0 - oy)).astype(jnp.float32) * (1.0 - wy1)
             + (iota_r == (iy1 - oy)).astype(jnp.float32) * wy1)
    col_w = ((iota_c == (ix0 - ox)).astype(jnp.float32) * (1.0 - wx1)
             + (iota_c == (ix1 - ox)).astype(jnp.float32) * wx1)
    row_w = row_w * alive

    load.wait()

    for ch in range(3):
        # pred[p] = sum_r rowW[r,p] * (T[ch] @ colW)[r,p]
        u_rp = jax.lax.dot_general(
            region[ch, :, :], col_w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # [RH, TILE_PX]
        out_ref[0, ch, :] = jnp.sum(row_w * u_rp, axis=0)


@functools.partial(jax.jit, static_argnames=("region_h", "region_w",
                                             "out_hw", "interpret"))
def gather_pallas(texture_cfirst, uv, origins, out_hw, region_h=None,
                  region_w=None, interpret=False):
    """Windowed bilinear gather (forward twin of the splat; same plans).

    Args:
        texture_cfirst: ``[3, tex_h, tex_w]``.
        uv: ``[V, H, W, 2]``.
        out_hw: (H, W) of the pixel grid (static).
    Returns:
        ``[V, H, W, 3]`` samples, with contributions only from each tile's
        window — the caller overlays the planner's residual corners.
    """
    from stylemesh_tpu.ops.splat_plan import effective_region

    _, tex_h, tex_w = texture_cfirst.shape
    region_h, region_w = effective_region(tex_h, tex_w, region_h, region_w)
    uv_tiles = _tile_batch_cfirst(uv.astype(jnp.float32), -10.0)
    n_tiles = uv_tiles.shape[0]
    assert origins.shape[0] == n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2, TILE_PX), lambda i, oy, ox: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # atlas
        ],
        out_specs=pl.BlockSpec((1, 3, TILE_PX), lambda i, oy, ox: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((3, region_h, region_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_gather_kernel, tex_h, tex_w, region_h, region_w)
    out_tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 3, TILE_PX), jnp.float32),
        interpret=interpret,
    )(origins[:, 0], origins[:, 1], uv_tiles, texture_cfirst)

    # un-tile back to [V, H, W, 3]
    v = uv.shape[0]
    h, w = out_hw
    hh = -(-h // TILE_H) * TILE_H
    ww = -(-w // TILE_W) * TILE_W
    x = out_tiles.reshape(v, hh // TILE_H, ww // TILE_W, 3, TILE_H, TILE_W)
    x = x.transpose(0, 1, 4, 2, 5, 3).reshape(v, hh, ww, 3)
    return x[:, :h, :w, :]


def gather_with_residual(texture, uv, origins, res_texel, res_pixel,
                         res_weight, interpret=False, **kw):
    """Full planned forward: windowed gather + residual-corner overlay.

    texture: ``[tex_h, tex_w, 3]`` (channel-last public layout).
    Returns ``[V, H, W, 3]`` — identical values to the plain XLA gather.
    """
    v, h, w = uv.shape[:3]
    out = gather_pallas(texture.transpose(2, 0, 1), uv, origins, (h, w),
                        interpret=interpret, **kw)
    flat_tex = texture.reshape(-1, 3)
    vals = jnp.take(flat_tex, res_texel.reshape(-1), axis=0)
    vals = vals * res_weight.reshape(-1, 1)
    # batched scatter-add into the pixel grid (cap entries; cheap)
    view_ids = jnp.repeat(jnp.arange(v, dtype=jnp.int32), res_pixel.shape[1])
    flat_idx = view_ids * (h * w) + res_pixel.reshape(-1)
    out_flat = out.reshape(v * h * w, 3).at[flat_idx].add(vals)
    out = out_flat.reshape(v, h, w, 3)
    # analytic background: grid exactly (-1,-1) samples texel (0,0), weight 1
    bg = jnp.logical_and(uv[..., 0] == -1.0, uv[..., 1] == -1.0)[..., None]
    return jnp.where(bg, texture[0, 0][None, None, None, :], out)


def splat_with_residual(g, uv, origins, res_texel, res_pixel, res_weight,
                        tex_h, tex_w, interpret=False, **kw):
    """Full backward: Pallas window splat + compact XLA residual scatter.

    res_*: ``[V, cap]`` per-view residual lists (0-weight padding).
    """
    atlas = splat_pallas(g, uv, origins, tex_h, tex_w, interpret=interpret, **kw)
    v = g.shape[0]
    g_flat = g.reshape(v, -1, 3)
    upd = jnp.take_along_axis(g_flat, res_pixel[..., None], axis=1)
    upd = upd * res_weight[..., None]
    flat = atlas.reshape(-1, 3)
    flat = flat.at[res_texel.reshape(-1)].add(upd.reshape(-1, 3))
    atlas = flat.reshape(tex_h, tex_w, 3)
    # analytic background: every grid-(-1,-1) pixel adds its cotangent to
    # texel (0,0) with weight 1 (a dense masked sum — these pixels would
    # otherwise all be scatter residuals)
    bg = jnp.logical_and(uv[..., 0] == -1.0, uv[..., 1] == -1.0)[..., None]
    bg_sum = jnp.sum(g * bg.astype(g.dtype), axis=(0, 1, 2))
    return atlas.at[0, 0, :].add(bg_sum)
