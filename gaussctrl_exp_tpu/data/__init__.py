from .dataparser import DataParserConfig, DataparserOutputs, load_scene
from .datamanager import DataManager, DataManagerConfig
from .ply import read_ply_points

__all__ = [
    "DataParserConfig",
    "DataparserOutputs",
    "load_scene",
    "DataManager",
    "DataManagerConfig",
    "read_ply_points",
]
