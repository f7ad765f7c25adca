"""Segmentation stack: SAM (Flax) + pluggable box providers.

TPU-native replacement for the reference's vendored Lang-SAM
(/root/reference/gaussctrl/lang_sam.py): box-prompted SAM masks with the
text→box stage pluggable (GroundingDINO checkpoints don't exist in this
environment; precomputed boxes/masks or any callable work in its place).
"""

from .sam import SAM, SAMConfig  # noqa: F401
from .lang_sam import LangSAM, BoxProvider  # noqa: F401
