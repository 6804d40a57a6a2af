from .snapshot import GaussianPacket, VizChannel
from .viewer import render_view, save_view_png, OfflineViewer

__all__ = [
    "GaussianPacket",
    "VizChannel",
    "render_view",
    "save_view_png",
    "OfflineViewer",
]
