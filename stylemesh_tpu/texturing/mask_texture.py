"""Texture masking: zero out texels never observed by any view.

Re-implements /root/reference/scripts/textures/mask_texture.py:30-96: every
view's UV map splats its pixels onto the 4 surrounding texels; texels touched
by at least ``min_fraction`` of the views are kept, the rest zeroed (the
reference defaults to 2% of views).

TPU-first: the per-view splat is one vectorized scatter-add instead of the
reference's python loop over pixels.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnums=(2, 3))
def _splat_counts(uv_grid, mask, tex_h, tex_w):
    """One view: scatter 1s at the 4 texel corners under each valid pixel.

    uv_grid: [H, W, 2] in [-1, 1] (x, y); mask: [H, W, 1].
    Returns [tex_h, tex_w] float counts (binarized per view by the caller).
    """
    px = (uv_grid[..., 0] + 1.0) * 0.5 * (tex_w - 1)
    py = (uv_grid[..., 1] + 1.0) * 0.5 * (tex_h - 1)
    px = jnp.clip(px, 0.0, tex_w - 1)
    py = jnp.clip(py, 0.0, tex_h - 1)
    x0 = jnp.floor(px).astype(jnp.int32)
    y0 = jnp.floor(py).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, tex_w - 1)
    y1 = jnp.minimum(y0 + 1, tex_h - 1)
    m = mask[..., 0].reshape(-1)
    flat = jnp.zeros((tex_h * tex_w,), jnp.float32)
    for yy, xx in [(y0, x0), (y0, x1), (y1, x0), (y1, x1)]:
        idx = (yy * tex_w + xx).reshape(-1)
        flat = flat.at[idx].add(m)
    return (flat > 0).astype(jnp.float32).reshape(tex_h, tex_w)


def compute_texture_mask(uv_grids, masks, tex_hw, min_fraction=0.02):
    """Fraction-of-views visibility mask over the atlas.

    Args:
        uv_grids: iterable of [H, W, 2] grids in [-1, 1] (per view; may vary
            in resolution).
        masks: matching [H, W, 1] validity masks.
        tex_hw: (H_tex, W_tex).
    Returns:
        [H_tex, W_tex] bool — texels seen by >= min_fraction of views.
    """
    th, tw = tex_hw
    counts = np.zeros((th, tw), np.float32)
    n = 0
    for uv, m in zip(uv_grids, masks):
        counts += np.asarray(_splat_counts(jnp.asarray(uv), jnp.asarray(m), th, tw))
        n += 1
    return counts >= max(1.0, min_fraction * n)


def mask_texture(texture_img, tex_mask):
    """Apply the visibility mask: unseen texels -> 0 ([H, W, C] * [H, W])."""
    return np.asarray(texture_img) * np.asarray(tex_mask)[..., None]
