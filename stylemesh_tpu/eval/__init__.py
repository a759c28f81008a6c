from stylemesh_tpu.eval.reprojection import eval_reprojection_consistency
from stylemesh_tpu.eval.lpips import LPIPSDistance

__all__ = ["eval_reprojection_consistency", "LPIPSDistance"]
