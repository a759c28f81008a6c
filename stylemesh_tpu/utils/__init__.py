from stylemesh_tpu.utils.checkpoint import (
    load_texture_npz,
    restore_train_state,
    save_texture_image,
    save_texture_layers,
    save_texture_npz,
    save_train_state,
)
from stylemesh_tpu.utils.logging import MetricsLogger

__all__ = [
    "save_train_state",
    "restore_train_state",
    "save_texture_npz",
    "load_texture_npz",
    "save_texture_image",
    "save_texture_layers",
    "MetricsLogger",
]
