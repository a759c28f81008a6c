from stylemesh_tpu.models.vgg import (
    VGG_LAYER_CHANNELS,
    init_vgg_params,
    load_vgg_params,
    save_vgg_params,
    vgg_features,
)
from stylemesh_tpu.models.texture import (
    HierarchicalTexture,
    Texture,
    sample_texture,
    texture_image,
    texture_regularizer,
)
from stylemesh_tpu.models.losses import ContentAndStyleLoss, StyleTargets
from stylemesh_tpu.models.pipeline import (
    PipelineConfig,
    TrainState,
    TexturePipeline,
)

__all__ = [
    "VGG_LAYER_CHANNELS",
    "init_vgg_params",
    "load_vgg_params",
    "save_vgg_params",
    "vgg_features",
    "Texture",
    "HierarchicalTexture",
    "sample_texture",
    "texture_image",
    "texture_regularizer",
    "ContentAndStyleLoss",
    "StyleTargets",
    "PipelineConfig",
    "TrainState",
    "TexturePipeline",
]
