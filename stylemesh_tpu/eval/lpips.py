"""LPIPS-style perceptual distance in JAX.

The reference evaluates reprojection consistency with ``lpips.LPIPS
(net='vgg')`` (/root/reference/scripts/eval/eval_image_folders.py:237-242).
That architecture is: inputs in [-1, 1] RGB -> per-channel shift/scale ->
VGG16 features at relu{1_2, 2_2, 3_3, 4_3, 5_3} -> channel-unit-normalize ->
per-channel learned linear weights -> spatial mean -> sum over layers.

Calibrated LPIPS 'lin' weights can be loaded from an ``.npz`` (convert the
pip package's state dict once with ``tools/convert_lpips.py``). Without them
this falls back to uniform linear weights — a structurally identical,
uncalibrated perceptual distance, flagged in the result key.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from stylemesh_tpu.models.vgg import vgg_features

# LPIPS scaling layer constants (shift/scale on [-1,1] RGB inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# VGG16 activations used by LPIPS, in our layer naming (second conv of each
# block before the pool: relu1_2, 2_2, 3_3, 4_3, 5_3)
LPIPS_LAYERS = ("r12", "r22", "r33", "r43", "r53")


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPSDistance:
    """Callable ``d(a, b)`` on ``[B, H, W, 3]`` RGB in [0, 1].

    Args:
        vgg_params: VGG16 conv params (ideally torchvision-trained; the Gatys
            weights also work structurally).
        lin_weights: optional dict layer -> ``[C]`` calibrated weights.
        input_range01: inputs in [0,1] are mapped to [-1,1] (LPIPS convention).
    """

    def __init__(self, vgg_params, lin_weights: Optional[dict] = None,
                 input_range01=True):
        self.vgg_params = vgg_params
        self.lin_weights = lin_weights
        self.input_range01 = input_range01
        self.calibrated = lin_weights is not None
        self._jit = jax.jit(self._distance)

    @staticmethod
    def load_lin_weights(path):
        data = np.load(path)
        return {k: jnp.asarray(data[k]) for k in LPIPS_LAYERS}

    def _distance(self, a, b):
        if self.input_range01:
            a = a * 2.0 - 1.0
            b = b * 2.0 - 1.0
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        a = (a - shift) / scale
        b = (b - shift) / scale
        fa = vgg_features(self.vgg_params, a, LPIPS_LAYERS)
        fb = vgg_features(self.vgg_params, b, LPIPS_LAYERS)
        total = 0.0
        for k in LPIPS_LAYERS:
            da = _unit_normalize(fa[k])
            db = _unit_normalize(fb[k])
            diff = (da - db) ** 2
            if self.lin_weights is not None:
                diff = diff * self.lin_weights[k]
                layer_d = jnp.mean(jnp.sum(diff, axis=-1), axis=(1, 2))
            else:
                # uncalibrated fallback: uniform 1/C weights
                layer_d = jnp.mean(jnp.mean(diff, axis=-1), axis=(1, 2))
            total = total + layer_d
        return total  # [B]

    def __call__(self, a, b):
        return self._jit(jnp.asarray(a), jnp.asarray(b))
