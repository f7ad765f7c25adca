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
