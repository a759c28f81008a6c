"""Image masking: apply the UV-validity mask to styled frames -> RGBA.

Re-implements /root/reference/scripts/textures/mask_image.py (single image +
uv map) and mask_images.py (whole dataset): pixels without a valid UV mapping
become transparent.
"""

import numpy as np
from PIL import Image


def mask_image(image, mask):
    """RGB [H, W, 3] (uint8 or [0,1] float) + mask [H, W] -> RGBA PIL image."""
    arr = np.asarray(image)
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0, 1) * 255 + 0.5).astype(np.uint8)
    alpha = (np.asarray(mask) > 0).astype(np.uint8) * 255
    rgba = np.concatenate([arr, alpha[..., None]], axis=-1)
    return Image.fromarray(rgba, mode="RGBA")


def mask_images_for_scene(scene_cache, styled_dir, out_dir):
    """Mask every styled frame of a scene with its UV-validity mask."""
    import os
    from os.path import join

    os.makedirs(out_dir, exist_ok=True)
    b = scene_cache._batch_all
    paths = []
    for p, idx in enumerate(scene_cache.indices):
        img = Image.open(join(styled_dir, f"{idx}.png")).convert("RGB")
        mask = np.asarray(b.mask[p])[..., 0]
        if img.size != (mask.shape[1], mask.shape[0]):
            img = img.resize((mask.shape[1], mask.shape[0]),
                             Image.Resampling.BILINEAR)
        out = mask_image(np.asarray(img), mask)
        path = join(out_dir, f"{idx}_masked.png")
        out.save(path)
        paths.append(path)
    return paths
