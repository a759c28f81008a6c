"""Image resizes matching torch ``F.interpolate`` semantics.

The reference relies on torch's bilinear (align_corners=False, no antialias)
and nearest (floor) interpolation in many places (pyramid construction,
mask/feature resizing — e.g. /root/reference/model/losses/
content_and_style_losses.py:161-176, /root/reference/model/model.py:199-254).
Each mismatch silently changes loss scale, so these are replicated exactly
and golden-tested against torch on CPU.

All images are channel-last: ``[B, H, W, C]`` (or ``[H, W, C]``).
"""

import functools

import jax
import jax.numpy as jnp


def _src_index_weights(out_size: int, in_size: int, dtype):
    """Half-pixel source coordinates for align_corners=False bilinear.

    torch: src = (dst + 0.5) * (in/out) - 0.5, clamped to >= 0; weights from
    the fractional part; the upper gather index is clamped to in-1.
    """
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=dtype)
    src = (dst + 0.5) * scale - 0.5
    src = jnp.maximum(src, 0.0)
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.minimum(i0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w1 = (src - i0.astype(dtype)).astype(dtype)
    w0 = 1.0 - w1
    return i0, i1, w0, w1


@functools.partial(jax.jit, static_argnums=(1,))
def resize_bilinear(img, size):
    """Bilinear resize, torch ``F.interpolate(mode='bilinear')`` semantics.

    Args:
        img: ``[..., H, W, C]`` array (any number of leading batch dims).
        size: target ``(H_out, W_out)``.
    Returns:
        ``[..., H_out, W_out, C]``.
    """
    h_out, w_out = size
    h_in, w_in = img.shape[-3], img.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return img
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    x = img.astype(dtype)

    y0, y1, wy0, wy1 = _src_index_weights(h_out, h_in, dtype)
    x0, x1, wx0, wx1 = _src_index_weights(w_out, w_in, dtype)

    # Gather rows then columns; separable bilinear.
    top = jnp.take(x, y0, axis=-3)
    bot = jnp.take(x, y1, axis=-3)
    rows = top * wy0[:, None, None] + bot * wy1[:, None, None]
    left = jnp.take(rows, x0, axis=-2)
    right = jnp.take(rows, x1, axis=-2)
    out = left * wx0[:, None] + right * wx1[:, None]
    return out.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) else out


@functools.partial(jax.jit, static_argnums=(1,))
def resize_nearest(img, size):
    """Nearest resize, torch ``F.interpolate(mode='nearest')`` semantics.

    torch maps output index i to source index ``floor(i * in / out)`` —
    note this differs from half-pixel rounding (PIL / jax.image.resize).

    Args:
        img: ``[..., H, W, C]``.
        size: target ``(H_out, W_out)``.
    """
    h_out, w_out = size
    h_in, w_in = img.shape[-3], img.shape[-2]
    if (h_in, w_in) == (h_out, w_out):
        return img
    ys = (jnp.arange(h_out) * h_in) // h_out
    xs = (jnp.arange(w_out) * w_in) // w_out
    out = jnp.take(img, ys, axis=-3)
    out = jnp.take(out, xs, axis=-2)
    return out
