from .attention import default_processor, make_cross_view_processor
from .pipeline import EditConfig, GaussCtrlEditPipeline, depth_to_disparity, select_reference_views
from .schedulers import DDIMInverseScheduler, DDIMScheduler, SchedulerConfig
from .sd_pipeline import SDControlNetPipeline, SDModels, init_random_models

__all__ = [
    "default_processor",
    "make_cross_view_processor",
    "EditConfig",
    "GaussCtrlEditPipeline",
    "depth_to_disparity",
    "select_reference_views",
    "DDIMInverseScheduler",
    "DDIMScheduler",
    "SchedulerConfig",
    "SDControlNetPipeline",
    "SDModels",
    "init_random_models",
]

from .geometry import bilinear_sample, depth_to_world_points, project_points
from .triplane_attention import make_triplane_processor
from .correspondence import (
    build_correspondence_tables,
    make_epipolar_processor,
    make_multires_epipolar_processor,
    overlap_ratio,
)
from .mv_generator import DepthGenerator, MVGeneratorConfig, init_depth_generator
from .inpaint import InpaintConfig, SDInpaintPipeline, mask_to_latent

__all__ += [
    "bilinear_sample",
    "depth_to_world_points",
    "project_points",
    "make_triplane_processor",
    "build_correspondence_tables",
    "make_epipolar_processor",
    "make_multires_epipolar_processor",
    "overlap_ratio",
    "DepthGenerator",
    "MVGeneratorConfig",
    "init_depth_generator",
    "InpaintConfig",
    "SDInpaintPipeline",
    "mask_to_latent",
]
