"""Top-level method configuration — the ``gaussctrl`` method spec, TPU-side.

Mirrors the reference's registered method
(/root/reference/gaussctrl/gc_config.py:40-92): trainer schedule (1000-iter
cap, save/250, eval image/100), the GaussCtrl pipeline knobs (render_rate 500,
guidance 5, 20 inference steps, chunk 5, 4 reference views, SD-1.x checkpoint
path), the datamanager's 4×10 view subsetting, and the dataparser defaults.
Optimizer hyperparameters live in engine/optimizers.py (same 7-group recipe).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from .data.datamanager import DataManagerConfig
from .data.dataparser import DataParserConfig
from .engine.trainer import TrainConfig
from .models.densify import DensifyConfig
from .models.splat_model import SplatModelConfig
from .ops.renderer import RenderConfig


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """GaussCtrl edit-pipeline knobs (ad_pipeline.py:52-77)."""

    render_rate: int = 500
    edit_prompt: str = ""
    reverse_prompt: str = ""
    langsam_obj: str = ""
    guidance_scale: float = 5.0
    num_inference_steps: int = 20
    chunk_size: int = 5
    ref_view_num: int = 4
    diffusion_ckpt: str = "CompVis/stable-diffusion-v1-4"
    # sidecar persistence/resume; "" = scene data dir (the reference keeps
    # depth_npy/z_0/mask_npy/unedited inside the scene folder)
    sidecar_dir: str = ""
    resume_sidecars: bool = True
    # Lang-SAM equivalents: local SAM checkpoint (segmentation/convert.py) and
    # local CLIP checkpoint for text->box grounding (segmentation/grounding.py,
    # replacing GroundingDINO, lang_sam.py:84-113). Empty = precomputed-mask /
    # whole-frame fallbacks.
    sam_ckpt: str = ""
    clip_ckpt: str = ""


@dataclasses.dataclass(frozen=True)
class GaussCtrlConfig:
    """`gaussctrl` method: trainer schedule + pipeline + data (gc_config.py)."""

    data: Path = Path("data/bear")
    load_checkpoint: str = ""
    output_dir: Path = Path("outputs")
    experiment_name: str = "gaussctrl"
    max_num_iterations: int = 1000
    steps_per_save: int = 250
    steps_per_eval_image: int = 100
    save_only_latest_checkpoint: bool = True
    seed: int = 42
    capacity: int = 1 << 17
    viewer_port: int = 0  # >0: serve the live viewer during training
    pipeline: PipelineConfig = PipelineConfig()
    train: TrainConfig = TrainConfig()
    datamanager: DataManagerConfig = dataclasses.field(default_factory=DataManagerConfig)


def default_render_config() -> RenderConfig:
    return RenderConfig(impl="auto", isect_capacity=1 << 18)
