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


def main(argv=None):
    """Texture-masking CLI — runnable twin of the reference's
    ``scripts/textures/mask_texture.py``: zero atlas texels that fewer than
    ``--min_fraction`` of the scene's views observe."""
    import argparse

    from PIL import Image

    from stylemesh_tpu.data.loading import SceneCache
    from stylemesh_tpu.optimize import RunConfig, discover_scene

    p = argparse.ArgumentParser(description="mask unobserved atlas texels")
    p.add_argument("--tex", required=True, help="texture image to mask")
    p.add_argument("--root_path", required=True)
    p.add_argument("--dataset", default="scannet",
                   choices=["scannet", "matterport"])
    p.add_argument("--scene", default="")
    p.add_argument("--out", default=None,
                   help="output path (default <tex>_masked.png)")
    p.add_argument("--min_fraction", type=float, default=0.02)
    p.add_argument("--resize_size", type=int, default=256)
    a = p.parse_args(argv)

    run = RunConfig(root_path=a.root_path, dataset=a.dataset, scene=a.scene,
                    min_images=1, resize_size=a.resize_size)
    cache = SceneCache(discover_scene(run), resize_size=a.resize_size)
    b = cache._batch_all
    tex_img = np.asarray(Image.open(a.tex).convert("RGB"))
    uv_top = np.asarray(b.uv[-1])  # highest-res uv level
    # validity straight from the uv grids (background bakes to exactly
    # (-1, -1)) — the reference's script also consumes only uv maps
    valid = ~((uv_top[..., 0] == -1.0) & (uv_top[..., 1] == -1.0))
    tex_mask = compute_texture_mask(
        [uv_top[v] for v in range(uv_top.shape[0])],
        [valid[v][..., None].astype(np.float32)
         for v in range(uv_top.shape[0])],
        tex_img.shape[:2], min_fraction=a.min_fraction)
    out = a.out or a.tex.rsplit(".", 1)[0] + "_masked.png"
    masked = mask_texture(tex_img, tex_mask).astype(np.uint8)
    Image.fromarray(masked).save(out)
    print(f"wrote {out} ({int(tex_mask.sum())} visible texels)")


if __name__ == "__main__":
    main()
