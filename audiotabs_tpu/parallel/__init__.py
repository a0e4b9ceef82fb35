from .mesh import make_mesh, default_mesh
from .batch import batch_analyze_sharded, make_batch_step

__all__ = ["make_mesh", "default_mesh", "batch_analyze_sharded", "make_batch_step"]
