from .colormaps import apply_depth_colormap, apply_turbo
from .cliconf import add_dataclass_args, apply_overrides, parse_config

__all__ = [
    "apply_depth_colormap",
    "apply_turbo",
    "add_dataclass_args",
    "apply_overrides",
    "parse_config",
]
