"""Binary erosion via a box filter, matching the reference's depth-mask
cleanup (/root/reference/model/model.py:204-208): a 3x3 all-ones convolution
with zero padding, divided by k^2, clamped to [0,1]; a pixel survives only if
the (clamped) response is exactly 1 — i.e. all k^2 neighbors are >= 1 and the
pixel is not on the zero-padded border fringe unless its in-bounds neighbors
sum to k^2 (impossible for 0/1 masks, so borders always erode)."""

import jax
import jax.numpy as jnp


def erode(x, kernel_size: int = 3):
    """Erode a ``[..., H, W, 1]`` 0/1 mask with a ``kernel_size``² box.

    Returns ``x * (box_mean(x) == 1)`` exactly as the reference computes it
    (values above 1 pre-clamp count as full support, relevant only for
    non-binary inputs — the reference clamps, we replicate).
    """
    k = kernel_size
    pad = (k - 1) // 2
    lead = x.shape[:-3]
    h, w = x.shape[-3], x.shape[-2]
    flat = x.reshape((-1, h, w)).astype(jnp.float32)
    summed = jax.lax.reduce_window(
        flat,
        0.0,
        jax.lax.add,
        window_dimensions=(1, k, k),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)),
    )
    response = jnp.clip(summed / (k * k), 0.0, 1.0)
    keep = (response == 1.0).astype(x.dtype)
    return x * keep.reshape(lead + (h, w, 1))
