from .projection import BLOCK, ProjectedGaussians, project_gaussians
from .binning import TileBins, bin_gaussians, estimate_capacity
from .sh import eval_sh, num_sh_bases, sh_basis
from .quat import quat_to_rotmat, scale_rot_to_cov3d
from .renderer import RenderConfig, RenderOutputs, render

__all__ = [
    "BLOCK",
    "ProjectedGaussians",
    "project_gaussians",
    "TileBins",
    "bin_gaussians",
    "estimate_capacity",
    "eval_sh",
    "num_sh_bases",
    "sh_basis",
    "quat_to_rotmat",
    "scale_rot_to_cov3d",
    "RenderConfig",
    "RenderOutputs",
    "render",
]
