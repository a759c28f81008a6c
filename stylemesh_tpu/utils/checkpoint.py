"""Checkpointing and texture export.

The reference relies on Lightning's module checkpoint plus per-epoch texture
jpg/pt dumps (/root/reference/model/texture/texture.py:59-70,123-135 and
model/model.py:378-385). Here:

- full train state (texture pyramid + Adam state + step + gram cache) goes
  through orbax — restartable optimization;
- texture exports match the reference formats: per-layer images, the
  composited full-res image (Gatys post -> RGB [0,1] jpg), and raw arrays
  (npz instead of torch .pt).
"""

import os
from os.path import join

import jax
import numpy as np
from PIL import Image

from stylemesh_tpu.models.texture import Texture, texture_image
from stylemesh_tpu.ops.color import gatys_post


def save_train_state(state, path):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_train_state(template_state, path):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template_state)


def save_texture_npz(texture: Texture, path):
    """Raw texture layers (the reference's .pt equivalent)."""
    np.savez(path, **{f"layer_{i}": np.asarray(l)
                      for i, l in enumerate(texture.layers)})


def load_texture_npz(path) -> Texture:
    data = np.load(path)
    layers = [data[f"layer_{i}"] for i in range(len(data.files))]
    return Texture.from_arrays(layers)


def _to_pil(img_hwc3):
    arr = np.asarray(jax.device_get(img_hwc3))
    arr = np.clip(arr, 0.0, 1.0)
    return Image.fromarray((arr * 255.0 + 0.5).astype(np.uint8))


def save_texture_image(texture: Texture, directory, prefix=""):
    """Composite full-res texture -> ``<prefix>texture.jpg`` in RGB
    (reference save_image with the post() transform)."""
    img = gatys_post(texture_image(texture))
    path = join(directory, f"{prefix}texture.jpg")
    _to_pil(img).save(path)
    return path


def save_texture_layers(texture: Texture, directory, prefix=""):
    """Per-layer images (reference save_layers naming)."""
    paths = []
    for i, layer in enumerate(texture.layers):
        img = gatys_post(layer)
        path = join(directory, f"{prefix}_layer{i}_texture.jpg")
        _to_pil(img).save(path)
        paths.append(path)
    return paths
