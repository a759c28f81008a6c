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


def main(argv=None):
    """Image-masking CLI — runnable twin of the reference's
    ``scripts/textures/mask_image.py`` / ``mask_images.py``. Two modes::

        # single image + uv map
        python -m stylemesh_tpu.texturing.mask_image --image f.png --uv f.npy
        # whole scene of styled frames
        python -m stylemesh_tpu.texturing.mask_image --root_path R \\
            --scene scene0000_00 --styled DIR --out DIR_masked
    """
    import argparse

    p = argparse.ArgumentParser(description="mask images to RGBA by UV validity")
    p.add_argument("--image", help="single RGB image to mask")
    p.add_argument("--uv", help="uv .npy for --image (channels 0/1 = uv)")
    p.add_argument("--root_path", help="dataset root (scene mode)")
    p.add_argument("--dataset", default="scannet",
                   choices=["scannet", "matterport"])
    p.add_argument("--scene", default="")
    p.add_argument("--styled", help="folder of styled frames (scene mode)")
    p.add_argument("--out", help="output folder (scene mode)")
    p.add_argument("--resize_size", type=int, default=256)
    a = p.parse_args(argv)

    if a.image:
        assert a.uv, "--image needs --uv"
        uv = np.load(a.uv)
        mask = (uv[..., 0] != 0) | (uv[..., 1] != 0)
        img = Image.open(a.image).convert("RGB")
        if img.size != (mask.shape[1], mask.shape[0]):
            img = img.resize((mask.shape[1], mask.shape[0]),
                             Image.Resampling.BILINEAR)
        out_path = a.image.rsplit(".", 1)[0] + "_masked.png"
        mask_image(np.asarray(img), mask).save(out_path)
        print(f"wrote {out_path}")
        return

    assert a.root_path and a.styled and a.out, \
        "scene mode needs --root_path --styled --out"
    from stylemesh_tpu.data.loading import SceneCache
    from stylemesh_tpu.optimize import RunConfig, discover_scene

    run = RunConfig(root_path=a.root_path, dataset=a.dataset, scene=a.scene,
                    min_images=1, resize_size=a.resize_size)
    cache = SceneCache(discover_scene(run), resize_size=a.resize_size)
    paths = mask_images_for_scene(cache, a.styled, a.out)
    print(f"wrote {len(paths)} masked frames to {a.out}")


if __name__ == "__main__":
    main()
