from .lie import so3_exp, so3_left_jacobian, se3_exp, se3_retract
from .projection import (
    world_to_view,
    projection_matrix,
    full_projection,
    focal2fov,
    fov2focal,
)
from .sh import eval_sh, rgb_to_sh, sh_to_rgb, num_sh_coeffs

__all__ = [
    "so3_exp",
    "so3_left_jacobian",
    "se3_exp",
    "se3_retract",
    "world_to_view",
    "projection_matrix",
    "full_projection",
    "focal2fov",
    "fov2focal",
    "eval_sh",
    "rgb_to_sh",
    "sh_to_rgb",
    "num_sh_coeffs",
]
