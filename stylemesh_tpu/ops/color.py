"""Gatys-style RGB pre/post color transforms.

The VGG network used for the style loss was trained on BGR images with the
ImageNet channel mean subtracted and values scaled to 0..255. These
transforms replicate the reference semantics exactly
(see /root/reference/model/losses/rgb_transform.py:5-21): failing to match
them silently rescales the style loss.

All images here are channel-last ``[..., H, W, 3]`` (TPU-friendly NHWC).
"""

import jax.numpy as jnp

# ImageNet mean in *BGR* channel order (applied after the RGB->BGR flip),
# expressed in the 0..1 range.
_IMAGENET_MEAN_BGR = (0.40760392, 0.45795686, 0.48501961)

# Valid range of a Gatys-preprocessed pixel: pre(0)= -mean*255, pre(1)=(1-mean)*255.
# The reference clamps the texture atlas to this range each step
# (/root/reference/model/texture/texture.py:43).
GATYS_MIN = -123.6800
GATYS_MAX = 151.0610


def gatys_pre(rgb):
    """RGB [0,1] -> Gatys VGG input: BGR, mean-subtracted, scaled by 255.

    Args:
        rgb: ``[..., 3]`` array in [0, 1], RGB channel order (channel-last).
    Returns:
        ``[..., 3]`` array in roughly [-124, 152], BGR channel order.
    """
    bgr = rgb[..., ::-1]
    mean = jnp.asarray(_IMAGENET_MEAN_BGR, dtype=bgr.dtype)
    return (bgr - mean) * 255.0


def gatys_post(x):
    """Inverse of :func:`gatys_pre`: Gatys VGG input -> RGB in [0,1] (clamped)."""
    mean = jnp.asarray(_IMAGENET_MEAN_BGR, dtype=x.dtype)
    bgr = x / 255.0 + mean
    rgb = bgr[..., ::-1]
    return jnp.clip(rgb, 0.0, 1.0)
