from .mesh import make_mesh, default_mesh

__all__ = ["make_mesh", "default_mesh"]
