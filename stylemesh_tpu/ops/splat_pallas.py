"""Pallas TPU kernels: tiled texture-gradient splat + windowed gather.

The measured XLA scatter-add costs ~90ns per contribution on TPU (580ms for
one 2x784x1045 pyramid level into a 4096² atlas) and dominated the training
step. These kernels exploit structure:

1. UV maps are smooth within chart islands, so a TILE_H x TILE_W pixel
   tile's bilinear footprint fits one (or, across an island seam, two)
   REGION_H x REGION_W texel windows, planned host-side over the per-scene-
   constant UV maps (:mod:`stylemesh_tpu.ops.splat_plan`).
2. Within a window, the 4-corner splat factorizes into row/column one-hot
   weight matrices, so the accumulation becomes MXU matmuls:
   ``region[r, c] += sum_p rowW[r, p] * colW[c, p] * g[ch, p]``.
3. Background pixels (grid exactly (-1,-1) -> texel (0,0), weight 1) are
   handled analytically by the wrappers (dense masked sum / broadcast).
4. Leftovers outside both windows (3+-island tiles) go to a compact XLA
   residual scatter.

TPU layout notes: the atlas is processed channel-FIRST ``[3, H, W]`` — a
channel-minor ``[H, W, 3]`` HBM buffer tiles its 3-wide minor dim to 128
lanes (42x padding) and Mosaic rejects 3-wide DMA slices. Window origins are
(8, 128)-aligned (planner guarantees; ``pl.multiple_of`` proves it). Grid
steps run sequentially on the core, so read-modify-write windows never race;
the secondary window is processed strictly after the primary store so
overlapping windows stay correct.
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

_PREC = jax.lax.Precision.HIGHEST


def _corner_terms(u, v, tex_h, tex_w):
    """Shared corner math: indices, weights, aliveness ([1, TILE_PX] each)."""
    px = jnp.clip((u + 1.0) * 0.5 * (tex_w - 1), 0.0, tex_w - 1)
    py = jnp.clip((v + 1.0) * 0.5 * (tex_h - 1), 0.0, tex_h - 1)
    ix0 = jnp.floor(px).astype(jnp.int32)
    iy0 = jnp.floor(py).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, tex_w - 1)
    iy1 = jnp.minimum(iy0 + 1, tex_h - 1)
    wx1 = px - ix0.astype(jnp.float32)
    wy1 = py - iy0.astype(jnp.float32)
    # padded pixels (uv sentinel -10) and background pixels (exactly (-1,-1),
    # handled analytically by the wrappers) contribute nothing
    bg = jnp.logical_and(u == -1.0, v == -1.0)
    alive = jnp.logical_and(u > -5.0, jnp.logical_not(bg)).astype(jnp.float32)
    return iy0, iy1, ix0, ix1, wy1, wx1, alive


def _window_onehots(iy0, iy1, ix0, ix1, wy1, wx1, alive, oy, ox,
                    region_h, region_w):
    """Combined row/col one-hot weight matrices for a window (primary-window
    form: the 2x2 footprint factorizes)."""
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (region_h, TILE_PX), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (region_w, TILE_PX), 0)
    row_w = ((iota_r == (iy0 - oy)).astype(jnp.float32) * (1.0 - wy1)
             + (iota_r == (iy1 - oy)).astype(jnp.float32) * wy1)
    col_w = ((iota_c == (ix0 - ox)).astype(jnp.float32) * (1.0 - wx1)
             + (iota_c == (ix1 - ox)).astype(jnp.float32) * wx1)
    return row_w * alive, col_w


def _in_window(iy, ix, oy, ox, region_h, region_w):
    return ((iy >= oy) & (iy < oy + region_h)
            & (ix >= ox) & (ix < ox + region_w))


def _corner_list(iy0, iy1, ix0, ix1, wy1, wx1):
    return [
        (iy0, ix0, (1.0 - wy1) * (1.0 - wx1)),
        (iy0, ix1, (1.0 - wy1) * wx1),
        (iy1, ix0, wy1 * (1.0 - wx1)),
        (iy1, ix1, wy1 * wx1),
    ]


def _splat_kernel(tex_h, tex_w, region_h, region_w,
                  oy_ref, ox_ref, oy2_ref, ox2_ref, has2_ref,
                  uv_ref, g_ref, atlas_in_ref, atlas_ref,
                  region, sem_in, sem_out):
    del atlas_in_ref  # aliased with atlas_ref
    i = pl.program_id(0)
    oy = pl.multiple_of(oy_ref[i], 8)
    ox = pl.multiple_of(ox_ref[i], 128)

    load = pltpu.make_async_copy(
        atlas_ref.at[:, pl.ds(oy, region_h), pl.ds(ox, region_w)],
        region, sem_in)
    load.start()

    uv = uv_ref[0]  # [2, TILE_PX]
    g = g_ref[0]  # [3, TILE_PX]
    iy0, iy1, ix0, ix1, wy1, wx1, alive = _corner_terms(
        uv[0:1, :], uv[1:2, :], tex_h, tex_w)
    row_w, col_w = _window_onehots(iy0, iy1, ix0, ix1, wy1, wx1, alive,
                                   oy, ox, region_h, region_w)
    load.wait()

    for ch in range(3):
        a = row_w * g[ch:ch + 1, :]  # [RH, TILE_PX]
        m = jax.lax.dot_general(
            a, col_w, dimension_numbers=(((1,), (1,)), ((), ())),
            precision=_PREC, preferred_element_type=jnp.float32)
        region[ch, :, :] = region[ch, :, :] + m

    store = pltpu.make_async_copy(
        region,
        atlas_ref.at[:, pl.ds(oy, region_h), pl.ds(ox, region_w)],
        sem_out)
    store.start()
    store.wait()

    # secondary (seam) window: per-corner terms excluded from window 1,
    # processed strictly after the primary store (windows may overlap)
    @pl.when(has2_ref[i] != 0)
    def _():
        oy2 = pl.multiple_of(oy2_ref[i], 8)
        ox2 = pl.multiple_of(ox2_ref[i], 128)
        load2 = pltpu.make_async_copy(
            atlas_ref.at[:, pl.ds(oy2, region_h), pl.ds(ox2, region_w)],
            region, sem_in)
        load2.start()
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (region_h, TILE_PX), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (region_w, TILE_PX), 0)
        load2.wait()
        for iy, ix, wgt in _corner_list(iy0, iy1, ix0, ix1, wy1, wx1):
            excl = 1.0 - _in_window(iy, ix, oy, ox, region_h, region_w
                                    ).astype(jnp.float32)
            oh_r = (iota_r == (iy - oy2)).astype(jnp.float32)
            oh_c = (iota_c == (ix - ox2)).astype(jnp.float32)
            coef = wgt * excl * alive
            for ch in range(3):
                a = oh_r * (coef * g[ch:ch + 1, :])
                m = jax.lax.dot_general(
                    a, oh_c, dimension_numbers=(((1,), (1,)), ((), ())),
                    precision=_PREC, preferred_element_type=jnp.float32)
                region[ch, :, :] = region[ch, :, :] + m
        store2 = pltpu.make_async_copy(
            region,
            atlas_ref.at[:, pl.ds(oy2, region_h), pl.ds(ox2, region_w)],
            sem_out)
        store2.start()
        store2.wait()


def _gather_kernel(tex_h, tex_w, region_h, region_w,
                   oy_ref, ox_ref, oy2_ref, ox2_ref, has2_ref,
                   uv_ref, atlas_ref, out_ref,
                   region, sem_in):
    i = pl.program_id(0)
    oy = pl.multiple_of(oy_ref[i], 8)
    ox = pl.multiple_of(ox_ref[i], 128)

    load = pltpu.make_async_copy(
        atlas_ref.at[:, pl.ds(oy, region_h), pl.ds(ox, region_w)],
        region, sem_in)
    load.start()

    uv = uv_ref[0]
    iy0, iy1, ix0, ix1, wy1, wx1, alive = _corner_terms(
        uv[0:1, :], uv[1:2, :], tex_h, tex_w)
    row_w, col_w = _window_onehots(iy0, iy1, ix0, ix1, wy1, wx1, alive,
                                   oy, ox, region_h, region_w)
    load.wait()

    for ch in range(3):
        # pred[p] = sum_r rowW[r,p] * (T[ch] @ colW)[r,p]
        u_rp = jax.lax.dot_general(
            region[ch, :, :], col_w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=_PREC, preferred_element_type=jnp.float32)
        out_ref[0, ch, :] = jnp.sum(row_w * u_rp, axis=0)

    @pl.when(has2_ref[i] != 0)
    def _():
        oy2 = pl.multiple_of(oy2_ref[i], 8)
        ox2 = pl.multiple_of(ox2_ref[i], 128)
        load2 = pltpu.make_async_copy(
            atlas_ref.at[:, pl.ds(oy2, region_h), pl.ds(ox2, region_w)],
            region, sem_in)
        load2.start()
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (region_h, TILE_PX), 0)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (region_w, TILE_PX), 0)
        load2.wait()
        for iy, ix, wgt in _corner_list(iy0, iy1, ix0, ix1, wy1, wx1):
            excl = 1.0 - _in_window(iy, ix, oy, ox, region_h, region_w
                                    ).astype(jnp.float32)
            oh_r = (iota_r == (iy - oy2)).astype(jnp.float32)
            oh_c = (iota_c == (ix - ox2)).astype(jnp.float32)
            coef = wgt * excl * alive
            for ch in range(3):
                u_rp = jax.lax.dot_general(
                    region[ch, :, :], oh_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=_PREC, preferred_element_type=jnp.float32)
                out_ref[0, ch, :] = out_ref[0, ch, :] + jnp.sum(
                    oh_r * u_rp, axis=0) * coef[0]


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
def splat_pallas(g, uv, origins, origins2, has2, tex_h, tex_w, region_h=None,
                 region_w=None, interpret=False):
    """Scatter-add 4-corner weighted pixel grads into a zeroed atlas.

    Args:
        g: ``[V, H, W, 3]`` pixel cotangents.
        uv: ``[V, H, W, 2]`` grids in [-1, 1] (x, y).
        origins/origins2: ``[V * n_tiles_per_view, 2]`` int32 window origins
            from the planner; has2: ``[n_tiles]`` 0/1 seam-window flags.
        tex_h/tex_w: atlas size; must be multiples of (8, 128) for the HBM
            window DMA (use the XLA scatter path otherwise).
    Returns:
        ``[tex_h, tex_w, 3]`` fp32 gradient (without the planner's residual
        and analytic-background contributions — the caller adds those).
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
        num_scalar_prefetch=5,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2, TILE_PX), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 3, TILE_PX), lambda i, *_: (i, 0, 0)),
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
        input_output_aliases={7: 0},  # atlas input (after prefetch args) -> out
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # the secondary-window corner loop peaks ~28MB of scoped VMEM
            # (one-hots per corner); the 16MB default is conservative
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins[:, 0], origins[:, 1], origins2[:, 0], origins2[:, 1], has2,
      uv_tiles, g_tiles, atlas_zero)
    return out.transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("region_h", "region_w",
                                             "out_hw", "interpret"))
def gather_pallas(texture_cfirst, uv, origins, origins2, has2, out_hw,
                  region_h=None, region_w=None, interpret=False):
    """Windowed bilinear gather (forward twin of the splat; same plans).

    Args:
        texture_cfirst: ``[3, tex_h, tex_w]``.
        uv: ``[V, H, W, 2]``; out_hw: (H, W) static.
    Returns:
        ``[V, H, W, 3]`` samples, with contributions only from each tile's
        window(s) — the caller overlays the planner's residual corners and
        the analytic background.
    """
    from stylemesh_tpu.ops.splat_plan import effective_region

    _, tex_h, tex_w = texture_cfirst.shape
    region_h, region_w = effective_region(tex_h, tex_w, region_h, region_w)
    uv_tiles = _tile_batch_cfirst(uv.astype(jnp.float32), -10.0)
    n_tiles = uv_tiles.shape[0]
    assert origins.shape[0] == n_tiles

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 2, TILE_PX), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # atlas
        ],
        out_specs=pl.BlockSpec((1, 3, TILE_PX), lambda i, *_: (i, 0, 0)),
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
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(origins[:, 0], origins[:, 1], origins2[:, 0], origins2[:, 1], has2,
      uv_tiles, texture_cfirst)

    # un-tile back to [V, H, W, 3]
    v = uv.shape[0]
    h, w = out_hw
    hh = -(-h // TILE_H) * TILE_H
    ww = -(-w // TILE_W) * TILE_W
    x = out_tiles.reshape(v, hh // TILE_H, ww // TILE_W, 3, TILE_H, TILE_W)
    x = x.transpose(0, 1, 4, 2, 5, 3).reshape(v, hh, ww, 3)
    return x[:, :h, :w, :]


def gather_with_residual(texture, uv, plan, interpret=False, **kw):
    """Full planned forward: windowed gather + residual corners + analytic
    background. Identical values to the plain XLA gather."""
    v, h, w = uv.shape[:3]
    out = gather_pallas(texture.transpose(2, 0, 1), uv, plan.origins,
                        plan.origins2, plan.has2, (h, w),
                        interpret=interpret, **kw)
    flat_tex = texture.reshape(-1, 3)
    vals = jnp.take(flat_tex, plan.res_texel.reshape(-1), axis=0)
    vals = vals * plan.res_weight.reshape(-1, 1)
    view_ids = jnp.repeat(jnp.arange(v, dtype=jnp.int32),
                          plan.res_pixel.shape[1])
    flat_idx = view_ids * (h * w) + plan.res_pixel.reshape(-1)
    out_flat = out.reshape(v * h * w, 3).at[flat_idx].add(vals)
    out = out_flat.reshape(v, h, w, 3)
    # analytic background: grid exactly (-1,-1) samples texel (0,0), weight 1
    bg = jnp.logical_and(uv[..., 0] == -1.0, uv[..., 1] == -1.0)[..., None]
    return jnp.where(bg, texture[0, 0][None, None, None, :], out)


def splat_with_residual(g, uv, plan, tex_h, tex_w, interpret=False, **kw):
    """Full planned backward: window splats + compact residual scatter +
    analytic background sum. Matches the XLA scatter-add backward."""
    atlas = splat_pallas(g, uv, plan.origins, plan.origins2, plan.has2,
                         tex_h, tex_w, interpret=interpret, **kw)
    v = g.shape[0]
    g_flat = g.reshape(v, -1, 3)
    upd = jnp.take_along_axis(g_flat, plan.res_pixel[..., None], axis=1)
    upd = upd * plan.res_weight[..., None]
    flat = atlas.reshape(-1, 3)
    flat = flat.at[plan.res_texel.reshape(-1)].add(upd.reshape(-1, 3))
    atlas = flat.reshape(tex_h, tex_w, 3)
    # analytic background: every grid-(-1,-1) pixel adds its cotangent to
    # texel (0,0) with weight 1
    bg = jnp.logical_and(uv[..., 0] == -1.0, uv[..., 1] == -1.0)[..., None]
    bg_sum = jnp.sum(g * bg.astype(g.dtype), axis=(0, 1, 2))
    return atlas.at[0, 0, :].add(bg_sum)
