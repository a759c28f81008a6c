"""Bilinear texture sampling — the op the whole method hinges on.

The reference "renders" by bilinearly sampling a texture atlas at baked
per-pixel UV coordinates with ``torch.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True)``
(/root/reference/model/texture/texture.py:46-54). Forward is a 4-corner
gather; backward is a 4-corner scatter-add of pixel gradients into the atlas.

This module implements those semantics with a custom VJP so the backward can
be swapped between a pure-XLA scatter-add and a Pallas TPU kernel without
touching callers. The texture is unbatched (one atlas shared by all views).

Conventions:
    texture: ``[H, W, C]`` channel-last.
    grid:    ``[..., 2]`` with ``(x, y)`` in ``[-1, 1]``;
             align_corners=True maps -1 -> pixel 0 and +1 -> pixel size-1.
"""

import functools

import jax
import jax.numpy as jnp


def _corner_indices_weights(grid, h, w):
    """Clamped corner indices + bilinear weights for an align_corners=True,
    border-padded sample. Returns int32 ``iy0, iy1, ix0, ix1`` and float
    weights ``wy1, wx1`` (the '0' weights are one-minus)."""
    dtype = grid.dtype
    # align_corners=True: pix = (g + 1) / 2 * (size - 1)
    px = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    # border padding: clamp the *coordinate*, then take floor/ceil corners.
    px = jnp.clip(px, 0.0, w - 1)
    py = jnp.clip(py, 0.0, h - 1)
    ix0 = jnp.floor(px).astype(jnp.int32)
    iy0 = jnp.floor(py).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)
    wx1 = (px - ix0.astype(dtype)).astype(dtype)
    wy1 = (py - iy0.astype(dtype)).astype(dtype)
    return iy0, iy1, ix0, ix1, wy1, wx1


def _gather_pixels(texture_flat, iy, ix, w):
    """Gather ``[..., C]`` pixels from a ``[H*W, C]`` flattened texture."""
    idx = iy * w + ix
    return jnp.take(texture_flat, idx.reshape(-1), axis=0).reshape(idx.shape + (texture_flat.shape[-1],))


def _grid_sample_fwd_impl(texture, grid):
    h, w, c = texture.shape
    iy0, iy1, ix0, ix1, wy1, wx1 = _corner_indices_weights(grid, h, w)
    flat = texture.reshape(h * w, c)
    v00 = _gather_pixels(flat, iy0, ix0, w)
    v01 = _gather_pixels(flat, iy0, ix1, w)
    v10 = _gather_pixels(flat, iy1, ix0, w)
    v11 = _gather_pixels(flat, iy1, ix1, w)
    wy1e = wy1[..., None]
    wx1e = wx1[..., None]
    top = v00 * (1.0 - wx1e) + v01 * wx1e
    bot = v10 * (1.0 - wx1e) + v11 * wx1e
    return top * (1.0 - wy1e) + bot * wy1e


def _scatter_add_grad(g, grid, h, w):
    """Backward: scatter-add 4-corner-weighted pixel grads into the atlas."""
    c = g.shape[-1]
    iy0, iy1, ix0, ix1, wy1, wx1 = _corner_indices_weights(grid, h, w)
    g2 = g.reshape(-1, c)
    wy1f = wy1.reshape(-1, 1)
    wx1f = wx1.reshape(-1, 1)
    idx00 = (iy0 * w + ix0).reshape(-1)
    idx01 = (iy0 * w + ix1).reshape(-1)
    idx10 = (iy1 * w + ix0).reshape(-1)
    idx11 = (iy1 * w + ix1).reshape(-1)
    dtex = jnp.zeros((h * w, c), dtype=g.dtype)
    dtex = dtex.at[idx00].add(g2 * (1.0 - wy1f) * (1.0 - wx1f))
    dtex = dtex.at[idx01].add(g2 * (1.0 - wy1f) * wx1f)
    dtex = dtex.at[idx10].add(g2 * wy1f * (1.0 - wx1f))
    dtex = dtex.at[idx11].add(g2 * wy1f * wx1f)
    return dtex.reshape(h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def grid_sample(texture, grid):
    """Bilinear sample of ``texture [H,W,C]`` at ``grid [...,2]`` (x,y in [-1,1]).

    torch parity: ``grid_sample(mode='bilinear', padding_mode='border',
    align_corners=True)`` with the texture broadcast over the batch.
    Differentiable w.r.t. ``texture`` only (UV grids are baked constants in
    this pipeline, as in the reference where uv maps are dataset inputs).
    """
    return _grid_sample_fwd_impl(texture, grid)


def _grid_sample_vjp_fwd(texture, grid):
    return _grid_sample_fwd_impl(texture, grid), (grid, texture.shape)


def _grid_sample_vjp_bwd(res, g):
    grid, (h, w, _) = res
    return _scatter_add_grad(g, grid, h, w), jnp.zeros_like(grid)


grid_sample.defvjp(_grid_sample_vjp_fwd, _grid_sample_vjp_bwd)


def _plan_zero_cotangents(plan):
    import numpy as np

    def zero(x):
        if jnp.issubdtype(x.dtype, jnp.integer):
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    return jax.tree.map(zero, plan)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def grid_sample_planned_cf(texture_cf, grid, plan, compute="f32"):
    """Bilinear sample of a channel-FIRST ``[3, H, W]`` texture, running both
    directions as Pallas window kernels.

    Identical values/gradients to :func:`grid_sample` (modulo the optional
    bf16 kernel compute), but the forward is the tiled windowed gather and
    the backward the tiled MXU splat (see ops/splat_pallas.py). The gradient
    comes back channel-first too, so a pipeline that keeps one channel-first
    texture copy per step pays no per-(level, layer) transposes.
    Requirements: ``grid`` is a batched ``[V, H, W, 2]`` view grid, texture
    dims divisible by (8, 128), ``plan`` the
    :class:`stylemesh_tpu.ops.splat_plan.PlanArrays` for (grid, texture).
    """
    from stylemesh_tpu.ops.splat_pallas import gather_with_residual

    interpret = jax.default_backend() == "cpu"
    return gather_with_residual(texture_cf, grid, plan, compute=compute,
                                interpret=interpret)


def _grid_sample_planned_cf_fwd(texture_cf, grid, plan, compute):
    return (grid_sample_planned_cf(texture_cf, grid, plan, compute),
            (grid, plan, texture_cf.shape))


def _grid_sample_planned_cf_bwd(compute, res, g):
    from stylemesh_tpu.ops.splat_pallas import splat_with_residual

    grid, plan, (_, h, w) = res
    # Mosaic path on real TPU backends ('tpu', this image's 'axon' tunnel);
    # interpreter on CPU (tests / virtual meshes)
    interpret = jax.default_backend() == "cpu"
    dtex = splat_with_residual(g, grid, plan, h, w, compute=compute,
                               interpret=interpret)
    return dtex, jnp.zeros_like(grid), _plan_zero_cotangents(plan)


grid_sample_planned_cf.defvjp(_grid_sample_planned_cf_fwd,
                              _grid_sample_planned_cf_bwd)


def grid_sample_planned(texture, grid, plan, compute="f32"):
    """Channel-last ``[H, W, 3]`` convenience wrapper around
    :func:`grid_sample_planned_cf` (transposes in/out; the hot path should
    hoist one channel-first copy per step instead)."""
    return grid_sample_planned_cf(texture.transpose(2, 0, 1), grid, plan,
                                  compute)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def grid_sample_banded_cf(texture_band, grid, plan_band, axis_name,
                          compute="f32"):
    """Atlas-sharded bilinear sample, called INSIDE a shard_map over
    ``axis_name``: each chip holds one row band ``[3, H/D, W]`` of the atlas
    and the band's slice of a :func:`..splat_plan.plan_arrays_banded` plan.
    The chip gathers only the tiles whose windows live in its band, partial
    per-pixel results are psum'd over ICI, and the analytic background texel
    (owned by band 0) is broadcast once. The backward splats the (replicated)
    cotangent into the local band only — texture gradients never cross chips.
    """
    from stylemesh_tpu.ops.splat_pallas import gather_with_residual

    interpret = jax.default_backend() == "cpu"
    row0 = jax.lax.axis_index(axis_name).astype(jnp.int32) * texture_band.shape[1]
    out = gather_with_residual(texture_band, grid, plan_band,
                               compute=compute, interpret=interpret,
                               include_background=False, row0=row0)
    out = jax.lax.psum(out, axis_name)
    is0 = (jax.lax.axis_index(axis_name) == 0).astype(texture_band.dtype)
    tex00 = jax.lax.psum(texture_band[:, 0, 0] * is0, axis_name)
    bg = jnp.logical_and(grid[..., 0] == -1.0, grid[..., 1] == -1.0)[..., None]
    return jnp.where(bg, tex00[None, None, None, :], out)


def _grid_sample_banded_fwd(texture_band, grid, plan_band, axis_name,
                            compute):
    out = grid_sample_banded_cf(texture_band, grid, plan_band, axis_name,
                                compute)
    return out, (grid, plan_band, texture_band.shape)


def _grid_sample_banded_bwd(axis_name, compute, res, g):
    from stylemesh_tpu.ops.splat_pallas import splat_with_residual

    grid, plan_band, (_, band_h, w) = res
    interpret = jax.default_backend() == "cpu"
    row0 = jax.lax.axis_index(axis_name).astype(jnp.int32) * band_h
    # the loss (hence g) is replicated across the atlas axis; each chip
    # accumulates only its band's windows + residuals
    dtex = splat_with_residual(g, grid, plan_band, band_h, w,
                               compute=compute, interpret=interpret,
                               include_background=False, row0=row0)
    bg = jnp.logical_and(grid[..., 0] == -1.0, grid[..., 1] == -1.0)[..., None]
    bg_sum = jnp.sum(g * bg.astype(g.dtype), axis=(0, 1, 2))
    is0 = (jax.lax.axis_index(axis_name) == 0).astype(dtex.dtype)
    dtex = dtex.at[:, 0, 0].add(bg_sum * is0)
    return dtex, jnp.zeros_like(grid), _plan_zero_cotangents(plan_band)


grid_sample_banded_cf.defvjp(_grid_sample_banded_fwd,
                             _grid_sample_banded_bwd)


def grid_sample_nearest(texture, grid):
    """Nearest-neighbor sample, border padding, align_corners=True.

    torch parity for ``grid_sample(mode='nearest', ...)`` (used by the
    reprojection eval, /root/reference/data/utils.py:150-165). torch rounds
    with ``std::nearbyint`` — round-half-to-EVEN — which matters because the
    eval's ``2x/W - 1`` grid convention puts many coordinates exactly on .5;
    ``jnp.round`` is also half-to-even. Not differentiable (depth lookups).
    """
    h, w, c = texture.shape
    px = (grid[..., 0] + 1.0) * 0.5 * (w - 1)
    py = (grid[..., 1] + 1.0) * 0.5 * (h - 1)
    px = jnp.clip(px, 0.0, w - 1)
    py = jnp.clip(py, 0.0, h - 1)
    ix = jnp.clip(jnp.round(px).astype(jnp.int32), 0, w - 1)
    iy = jnp.clip(jnp.round(py).astype(jnp.int32), 0, h - 1)
    flat = texture.reshape(h * w, c)
    return _gather_pixels(flat, iy, ix, w)
