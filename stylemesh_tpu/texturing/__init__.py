from stylemesh_tpu.texturing.mask_texture import compute_texture_mask, mask_texture
from stylemesh_tpu.texturing.mask_image import mask_image
from stylemesh_tpu.texturing.video import video_from_files

__all__ = ["compute_texture_mask", "mask_texture", "mask_image",
           "video_from_files"]
