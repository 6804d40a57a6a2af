from .params import StepConfig, MapOptConfig
from .insertion import new_points_from_frame, pseudo_depth_map, mono_bootstrap_depth
from .tracking import track_frame, TrackResult
from .mapping import (
    KeyframeBatch,
    KeyframeOptState,
    mapping_iterations,
    make_keyframe_opt_state,
)

__all__ = [
    "StepConfig",
    "MapOptConfig",
    "new_points_from_frame",
    "pseudo_depth_map",
    "mono_bootstrap_depth",
    "track_frame",
    "TrackResult",
    "KeyframeBatch",
    "KeyframeOptState",
    "mapping_iterations",
    "make_keyframe_opt_state",
]
