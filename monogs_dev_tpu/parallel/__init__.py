from .mesh import make_mesh, dp_mapping_step

__all__ = ["make_mesh", "dp_mapping_step"]
