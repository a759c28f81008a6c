from stylemesh_tpu.data.schema import ViewBatch

__all__ = ["ViewBatch"]
