from stylemesh_tpu.ops.color import gatys_pre, gatys_post
from stylemesh_tpu.ops.resize import resize_bilinear, resize_nearest
from stylemesh_tpu.ops.grid_sample import grid_sample, grid_sample_nearest
from stylemesh_tpu.ops.gram import gram_matrix, masked_gram
from stylemesh_tpu.ops.erosion import erode
from stylemesh_tpu.ops.pyramid import image_pyramid, pyramid_shapes

__all__ = [
    "gatys_pre",
    "gatys_post",
    "resize_bilinear",
    "resize_nearest",
    "grid_sample",
    "grid_sample_nearest",
    "gram_matrix",
    "masked_gram",
    "erode",
    "image_pyramid",
    "pyramid_shapes",
]
