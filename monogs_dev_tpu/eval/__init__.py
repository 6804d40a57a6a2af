from .ate import eval_ate, umeyama_alignment, ate_rmse
from .rendering import eval_rendering, save_gaussians

__all__ = ["eval_ate", "umeyama_alignment", "ate_rmse", "eval_rendering", "save_gaussians"]
