from .gaussians import GaussianParams, GaussianState, init_from_points, init_random
from .splat_model import ModelOutputs, SplatModelConfig, render_model
from .densify import DensifyConfig, DensifyStats, accumulate_stats, refine, reset_opacity

__all__ = [
    "GaussianParams",
    "GaussianState",
    "init_from_points",
    "init_random",
    "ModelOutputs",
    "SplatModelConfig",
    "render_model",
    "DensifyConfig",
    "DensifyStats",
    "accumulate_stats",
    "refine",
    "reset_opacity",
]
