"""torch SAM checkpoint → Flax params for segmentation/sam.py.

Mechanical rename in the same spirit as diffusion/convert.py: the Flax module
names were chosen to mirror ``segment_anything``'s state-dict paths
(sam_vit_h_4b8939.pth and friends, the checkpoints the reference downloads in
lang_sam.py:15-19), so conversion is: split the torch key into the right
flax scope path, transpose Dense kernels, HWIO-ify convs, keep everything
else raw (the 2×2 transposed-conv weights are consumed in torch layout by
sam.py::_up2x directly).
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np

# torch-key regex → (flax scope path with {g}roups, transform kind)
# kinds: dense (transpose 2D weight), conv (OIHW→HWIO), raw
_RULES: list[tuple[str, list[str], str]] = [
    (r"image_encoder\.patch_embed\.proj\.(weight|bias)",
     ["image_encoder", "patch_embed.proj", "{conv}"], "conv"),
    (r"image_encoder\.pos_embed", ["image_encoder", "pos_embed"], "raw"),
    (r"image_encoder\.blocks\.(\d+)\.(norm[12])\.(weight|bias)",
     ["image_encoder", "blocks.{0}", "{1}", "{ln}"], "raw"),
    (r"image_encoder\.blocks\.(\d+)\.attn\.(qkv|proj)\.(weight|bias)",
     ["image_encoder", "blocks.{0}", "attn", "{1}", "{dense}"], "dense"),
    (r"image_encoder\.blocks\.(\d+)\.attn\.(rel_pos_[hw])",
     ["image_encoder", "blocks.{0}", "attn", "{1}"], "raw"),
    (r"image_encoder\.blocks\.(\d+)\.mlp\.(lin[12])\.(weight|bias)",
     ["image_encoder", "blocks.{0}", "mlp.{1}", "{dense}"], "dense"),
    (r"image_encoder\.neck\.([02])\.weight",
     ["image_encoder", "neck.{0}", "{conv}"], "conv"),
    (r"image_encoder\.neck\.([13])\.(weight|bias)",
     ["image_encoder", "neck.{0}", "{1}"], "raw"),
    (r"prompt_encoder\.(pe_layer\.positional_encoding_gaussian_matrix"
     r"|point_embeddings\.\d+\.weight|not_a_point_embed\.weight|no_mask_embed\.weight)",
     ["prompt_encoder", "{0}"], "raw"),
    (r"mask_decoder\.(iou_token\.weight|mask_tokens\.weight)",
     ["mask_decoder", "{0}"], "raw"),
    (r"mask_decoder\.transformer\.layers\.(\d+)\.(self_attn|cross_attn_token_to_image"
     r"|cross_attn_image_to_token)\.([qkv]_proj|out_proj)\.(weight|bias)",
     ["mask_decoder", "transformer.layers.{0}", "{1}", "{2}", "{dense}"], "dense"),
    (r"mask_decoder\.transformer\.layers\.(\d+)\.(norm[1234])\.(weight|bias)",
     ["mask_decoder", "transformer.layers.{0}", "{1}", "{ln}"], "raw"),
    (r"mask_decoder\.transformer\.layers\.(\d+)\.mlp\.(lin[12])\.(weight|bias)",
     ["mask_decoder", "transformer.layers.{0}", "mlp.{1}", "{dense}"], "dense"),
    (r"mask_decoder\.transformer\.final_attn_token_to_image"
     r"\.([qkv]_proj|out_proj)\.(weight|bias)",
     ["mask_decoder", "transformer.final_attn_token_to_image", "{0}", "{dense}"], "dense"),
    (r"mask_decoder\.transformer\.norm_final_attn\.(weight|bias)",
     ["mask_decoder", "transformer.norm_final_attn", "{ln}"], "raw"),
    (r"mask_decoder\.output_upscaling\.([03])\.(weight|bias)",
     ["mask_decoder", "output_upscaling.{0}.{1}"], "raw"),
    (r"mask_decoder\.output_upscaling\.1\.(weight|bias)",
     ["mask_decoder", "output_upscaling.1", "{0}"], "raw"),
    (r"mask_decoder\.(output_hypernetworks_mlps\.\d+|iou_prediction_head)"
     r"\.layers\.(\d+)\.(weight|bias)",
     ["mask_decoder", "{0}", "layers.{1}", "{dense}"], "dense"),
]

_SKIP = re.compile(r"pixel_mean|pixel_std|prompt_encoder\.mask_downscaling")


def translate_sam_key(key: str, shape=None):
    """torch state-dict key → (flax path tuple, transform kind) or None."""
    if _SKIP.search(key):
        return None
    for pat, path_tmpl, kind in _RULES:
        m = re.fullmatch(pat, key)
        if m is None:
            continue
        leaf_is_weight = key.endswith("weight") or key.endswith("matrix") or not key.endswith("bias")
        subs = {
            "dense": "kernel" if key.endswith("weight") else "bias",
            "conv": "kernel" if key.endswith("weight") else "bias",
            "ln": "scale" if key.endswith("weight") else "bias",
        }
        path = []
        for part in path_tmpl:
            part = part.format(*m.groups(), **subs)
            path.append(part)
        eff = kind
        if kind == "dense" and key.endswith("bias"):
            eff = "raw"
        if kind == "conv" and key.endswith("bias"):
            eff = "raw"
        if kind == "dense" and shape is not None and len(shape) != 2:
            eff = "raw"
        return tuple(path), eff
    return None


def _transform(kind: str, w: np.ndarray) -> np.ndarray:
    if kind == "dense":
        return np.ascontiguousarray(w.T)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))  # OIHW→HWIO
    return w


def convert_sam_state_dict(sd: dict) -> dict:
    """Flat torch state dict → nested Flax ``{"params": ...}`` tree."""
    params: dict = {}
    unmatched = []
    for key, w in sd.items():
        w = np.asarray(w)
        tr = translate_sam_key(key, w.shape)
        if tr is None:
            if not _SKIP.search(key):
                unmatched.append(key)
            continue
        path, kind = tr
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = _transform(kind, w)
    if unmatched:
        raise ValueError(f"unconverted SAM keys: {unmatched[:8]}{'…' if len(unmatched) > 8 else ''}")
    return {"params": params}


def load_sam(ckpt_path: str | Path):
    """Read a ``sam_vit_*.pth`` torch checkpoint (CPU) and return Flax params."""
    import torch

    sd = torch.load(str(ckpt_path), map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_sam_state_dict(sd)


# ---------- inverse direction (used by tests to validate the mapping) ----------

def flax_to_torch_keys(tree: dict) -> dict:
    """Flax param tree → flat torch-style dict with INVERSE transforms.

    Round-tripping through convert_sam_state_dict must reproduce the tree —
    the test that pins the torch naming contract without needing torch/SAM.
    """
    flat: dict = {}

    def walk(node, path):
        if not isinstance(node, dict):
            key, w = _invert(path, np.asarray(node))
            flat[key] = w
            return
        for k, v in node.items():
            walk(v, path + [k])

    walk(tree["params"], [])
    return flat


def _invert(path: list[str], w: np.ndarray):
    joined = ".".join(path)
    leaf = path[-1]
    # undo flax leaf naming back to torch
    if leaf == "kernel":
        if w.ndim == 4:  # conv HWIO → OIHW
            return ".".join(path[:-1]) + ".weight", np.transpose(w, (3, 2, 0, 1))
        return ".".join(path[:-1]) + ".weight", np.ascontiguousarray(w.T)
    if leaf == "scale":
        return ".".join(path[:-1]) + ".weight", w
    if leaf == "bias":
        return ".".join(path[:-1]) + ".bias", w
    if leaf == "weight":  # LayerNorm2d
        return ".".join(path[:-1]) + ".weight", w
    return joined, w
