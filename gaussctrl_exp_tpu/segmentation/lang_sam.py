"""LangSAM-equivalent: text → boxes → SAM masks, with pluggable box providers.

The reference vendors Lang-SAM (/root/reference/gaussctrl/lang_sam.py):
GroundingDINO turns the text prompt into boxes (:84-113), SAM turns boxes
into masks (:115-121). GroundingDINO's checkpoints and CUDA deformable-attn
extension don't exist here, and per the reference README the mask path is
optional (README.md:110-116) — so the text→box stage is a *protocol*:

  * ``PrecomputedBoxes`` reads per-image box sidecars (``boxes.json``),
  * ``FullImageBox`` degrades to the whole frame (mask ≈ everything),
  * any ``Callable[(image, text)] -> (boxes, phrases, logits)`` plugs in.

``LangSAM.predict(image, text)`` keeps the reference's return signature
(masks, boxes, phrases, logits), so the edit pipeline's mask compositing
(ad_pipeline.py:229-242 behavior) is provider-agnostic.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Callable, Optional, Protocol, Sequence, Tuple

import jax
import numpy as np

from .sam import SAM, SAMConfig, postprocess_masks, preprocess_image

BoxResult = Tuple[np.ndarray, Sequence[str], np.ndarray]  # boxes xyxy, phrases, logits


class BoxProvider(Protocol):
    def __call__(self, image: np.ndarray, text: str) -> BoxResult: ...


class FullImageBox:
    """Whole-frame box — the no-detector fallback (masks everything)."""

    def __call__(self, image: np.ndarray, text: str) -> BoxResult:
        h, w = image.shape[:2]
        return np.array([[0.0, 0.0, w, h]], np.float32), [text], np.ones(1, np.float32)


class PrecomputedBoxes:
    """Boxes from a json sidecar: {"<image name>": [[x0,y0,x1,y1], ...], ...}.

    Companion to the reference's precomputed ``mask_npy/`` sidecar path
    (gc_dataset.py metadata) when full masks aren't precomputed but boxes are.
    """

    def __init__(self, path: str | Path, key: Optional[str] = None):
        self.table = json.loads(Path(path).read_text())
        self.key = key

    def __call__(self, image: np.ndarray, text: str) -> BoxResult:
        if self.key is None or self.key not in self.table:
            raise KeyError(f"no precomputed boxes for {self.key!r}")
        boxes = np.asarray(self.table[self.key], np.float32).reshape(-1, 4)
        return boxes, [text] * len(boxes), np.ones(len(boxes), np.float32)

    def bind(self, key: str) -> "PrecomputedBoxes":
        out = PrecomputedBoxes.__new__(PrecomputedBoxes)
        out.table, out.key = self.table, key
        return out


class LangSAM:
    """predict(image_uint8, text) -> (masks, boxes, phrases, logits).

    Same call signature/ordering as the reference's LangSAM.predict
    (lang_sam.py:115-121). ``params`` are Flax SAM params (from
    segmentation/convert.py::load_sam); box_provider defaults to the
    whole-frame fallback.
    """

    def __init__(self, params, cfg: SAMConfig = SAMConfig(),
                 box_provider: Optional[BoxProvider] = None):
        self.sam = SAM(cfg)
        self.cfg = cfg
        self.params = params
        self.box_provider = box_provider or FullImageBox()
        self._encode = jax.jit(lambda p, img: self.sam.apply(p, img, method=SAM.encode_image))
        self._predict = jax.jit(
            lambda p, emb, boxes: self.sam.apply(p, emb, boxes, method=SAM.predict_boxes))

    def predict(self, image: np.ndarray, text: str):
        boxes, phrases, logits = self.box_provider(image, text)
        if boxes.shape[0] == 0:
            h, w = image.shape[:2]
            return np.zeros((0, h, w), bool), boxes, phrases, logits
        batch, scale = preprocess_image(image, self.cfg.img_size)
        emb = self._encode(self.params, batch)
        emb = np.broadcast_to(np.asarray(emb), (boxes.shape[0], *emb.shape[1:]))
        low_res, _iou = self._predict(self.params, emb, boxes * scale)
        masks = postprocess_masks(low_res, scale, image.shape[:2], self.cfg.img_size)
        return np.asarray(masks)[:, 0], boxes, phrases, logits

    def as_mask_provider(self):
        """Adapter to the edit pipeline's ``mask_provider`` slot
        (diffusion/pipeline.py): (rgb float[0,1] or uint8, text) → (H, W) f32
        union mask, the role Lang-SAM plays in ad_pipeline.py:154-158."""

        def provide(rgb: np.ndarray, text: str) -> np.ndarray:
            img = rgb if rgb.dtype == np.uint8 else (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
            masks, _, _, _ = self.predict(img, text)
            if masks.shape[0] == 0:
                return np.zeros(img.shape[:2], np.float32)
            return masks.any(axis=0).astype(np.float32)

        return provide
