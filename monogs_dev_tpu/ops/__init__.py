from .raster_types import RasterConfig, RenderOutput
from .project import project_gaussians, ProjectedGaussians
from .rasterize_ref import render_reference
from .rasterize import render_tiled, render_binned, build_binning, Binning
from .knn import mean_sq_dist_knn3

__all__ = [
    "RasterConfig",
    "RenderOutput",
    "project_gaussians",
    "ProjectedGaussians",
    "render_reference",
    "render_tiled",
    "mean_sq_dist_knn3",
]
