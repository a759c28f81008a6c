from stylemesh_tpu.geometry.project import reproject, unproject
from stylemesh_tpu.geometry.rasterize import rasterize_mesh

__all__ = ["unproject", "reproject", "rasterize_mesh"]
