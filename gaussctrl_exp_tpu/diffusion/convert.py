"""torch/diffusers checkpoint → Flax parameter conversion.

The reference loads pretrained SD-1.4 + ControlNet-depth weights from the
HuggingFace hub (/root/reference/gaussctrl/ad_pipeline.py:101-108). This
environment has no network and no weight cache, so conversion is exercised on
synthetic state dicts in tests; at deployment, point ``load_sd_models`` at a
local diffusers-layout directory (model_index.json, unet/, vae/,
text_encoder/, controlnet/) with .bin or .safetensors weights.

Rules:
  * conv weights  (O, I, kh, kw) → (kh, kw, I, O)
  * linear weights (O, I) → (I, O)
  * norm weight/bias → scale/bias
  * diffusers module paths → our flat names (down_blocks.0.resnets.1 →
    down_0_resnet_1, …) — see ``translate_unet_key`` and friends.
"""

from __future__ import annotations

import re
from pathlib import Path

import numpy as np


def _put(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_tensor(name: str, w: np.ndarray, mod_path: str = "") -> tuple[str, np.ndarray]:
    """Map the trailing parameter name + transpose the value.

    ``mod_path`` (the translated module path) disambiguates layers whose
    torch/Flax layer types differ: diffusers SD1.x Transformer2D uses 1×1
    Conv2d for proj_in/proj_out (use_linear_projection=False) while our
    Transformer2D uses Dense — those (O, I, 1, 1) weights squeeze to (I, O).
    """
    w = np.asarray(w)
    if name == "weight":
        if w.ndim == 4:
            if mod_path.endswith(("proj_in", "proj_out")) and w.shape[2:] == (1, 1):
                return "kernel", w[:, :, 0, 0].transpose(1, 0)
            return "kernel", w.transpose(2, 3, 1, 0)
        if w.ndim == 2:
            return "kernel", w.transpose(1, 0)
        return "scale", w  # norm weight
    if name == "bias":
        return "bias", w
    raise ValueError(f"unknown parameter {name}")


_UNET_PATTERNS = [
    (r"^conv_in\.(.*)", r"conv_in.\1"),
    (r"^time_embedding\.linear_1\.(.*)", r"time_embedding_linear_1.\1"),
    (r"^time_embedding\.linear_2\.(.*)", r"time_embedding_linear_2.\1"),
    (r"^down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", r"down_\1_resnet_\2.\3"),
    (r"^down_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", r"down_\1_attn_\2.\3"),
    (r"^down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", r"down_\1_downsample.conv.\2"),
    (r"^mid_block\.resnets\.(\d+)\.(.*)", r"mid_resnet_\1.\2"),
    (r"^mid_block\.attentions\.0\.(.*)", r"mid_attn_0.\1"),
    (r"^up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", r"up_\1_resnet_\2.\3"),
    (r"^up_blocks\.(\d+)\.attentions\.(\d+)\.(.*)", r"up_\1_attn_\2.\3"),
    (r"^up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", r"up_\1_upsample.conv.\2"),
    (r"^conv_norm_out\.(.*)", r"conv_norm_out.\1"),
    (r"^conv_out\.(.*)", r"conv_out.\1"),
    # controlnet extras
    (r"^controlnet_cond_embedding\.conv_in\.(.*)", r"controlnet_cond_embedding.conv_in.\1"),
    (r"^controlnet_cond_embedding\.blocks\.(\d+)\.(.*)", r"controlnet_cond_embedding.blocks_\1.\2"),
    (r"^controlnet_cond_embedding\.conv_out\.(.*)", r"controlnet_cond_embedding.conv_out.\1"),
    (r"^controlnet_down_blocks\.(\d+)\.(.*)", r"controlnet_down_blocks_\1.\2"),
    (r"^controlnet_mid_block\.(.*)", r"controlnet_mid_block.\1"),
]

_ATTN_INNER = [
    (r"(.*)transformer_blocks\.(\d+)\.(.*)", r"\1transformer_blocks_\2.\3"),
    (r"(.*)\.to_out\.0\.(.*)", r"\1.to_out_0.\2"),
    (r"(.*)\.ff\.net\.0\.proj\.(.*)", r"\1.ff.proj.\2"),
    (r"(.*)\.ff\.net\.2\.(.*)", r"\1.ff.out.\2"),
]

_VAE_PATTERNS = [
    # pre-0.13 diffusers AttentionBlock names → modern to_q/to_k/to_v/to_out.0
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.query\.(.*)", r"\1.mid_attn.to_q.\2"),
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.key\.(.*)", r"\1.mid_attn.to_k.\2"),
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.value\.(.*)", r"\1.mid_attn.to_v.\2"),
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.proj_attn\.(.*)", r"\1.mid_attn.to_out_0.\2"),
    (r"^(encoder|decoder)\.conv_in\.(.*)", r"\1.conv_in.\2"),
    (r"^encoder\.down_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", r"encoder.down_\1_resnet_\2.\3"),
    (r"^encoder\.down_blocks\.(\d+)\.downsamplers\.0\.conv\.(.*)", r"encoder.down_\1_downsample.\2"),
    (r"^decoder\.up_blocks\.(\d+)\.resnets\.(\d+)\.(.*)", r"decoder.up_\1_resnet_\2.\3"),
    (r"^decoder\.up_blocks\.(\d+)\.upsamplers\.0\.conv\.(.*)", r"decoder.up_\1_upsample.\2"),
    (r"^(encoder|decoder)\.mid_block\.resnets\.(\d+)\.(.*)", r"\1.mid_resnet_\2.\3"),
    (r"^(encoder|decoder)\.mid_block\.attentions\.0\.(.*)", r"\1.mid_attn.\2"),
    (r"^(encoder|decoder)\.conv_norm_out\.(.*)", r"\1.conv_norm_out.\2"),
    (r"^(encoder|decoder)\.conv_out\.(.*)", r"\1.conv_out.\2"),
    (r"^quant_conv\.(.*)", r"encoder.quant_conv.\1"),
    (r"^post_quant_conv\.(.*)", r"decoder.post_quant_conv.\1"),
]


def _translate(key: str, patterns) -> str | None:
    for pat, rep in patterns:
        if re.match(pat, key):
            key = re.sub(pat, rep, key)
            for pat2, rep2 in _ATTN_INNER:
                while re.match(pat2, key):
                    new = re.sub(pat2, rep2, key)
                    if new == key:
                        break
                    key = new
            return key
    return None


def translate_unet_key(key: str):
    return _translate(key, _UNET_PATTERNS)


def translate_vae_key(key: str):
    return _translate(key, _VAE_PATTERNS)


def convert_state_dict(sd: dict, translate, strict: bool = False) -> dict:
    """torch-style flat {dotted_name: array} → nested Flax params tree.

    ``strict=True`` raises if any key fails to translate — a silently-skipped
    key means a silently-wrong model, so real-checkpoint loads use strict.
    """
    tree: dict = {}
    skipped = []
    for k, v in sd.items():
        parts = k.rsplit(".", 1)
        if len(parts) != 2:
            skipped.append(k)
            continue
        path, pname = parts
        new_path = translate(f"{path}.{pname}")
        if new_path is None:
            skipped.append(k)
            continue
        mod_path, pn = new_path.rsplit(".", 1)
        pn2, value = _convert_tensor(pn, np.asarray(v), mod_path)
        _put(tree, mod_path.split(".") + [pn2], value.astype(np.float32))
    if skipped:
        msg = f"convert_state_dict skipped {len(skipped)} keys, e.g. {skipped[:6]}"
        if strict:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg)
    return tree


def _read_weights(model_dir: Path) -> dict:
    files = list(model_dir.glob("*.safetensors")) + list(model_dir.glob("*.bin"))
    if not files:
        raise FileNotFoundError(f"no weight files in {model_dir}")
    sd = {}
    for f in files:
        if f.suffix == ".safetensors":
            from safetensors.numpy import load_file

            sd.update(load_file(str(f)))
        else:
            import torch

            sd.update({k: v.numpy() for k, v in torch.load(str(f), map_location="cpu").items()})
    return sd


def load_sd_models(root: str | Path, controlnet_dir: str | Path | None = None,
                   dtype=None):
    """Load a local diffusers-layout SD + ControlNet directory into SDModels.

    ``dtype`` is the compute dtype of the denoise stack; default bfloat16 —
    the TPU-native counterpart of the reference's fp16 deployment
    (ad_pipeline.py:101-108). Params stay f32; matmuls/convs run bf16 on the
    MXU with fp32 softmax guards in every attention. Pass jnp.float32 to
    force full precision."""
    import jax.numpy as jnp

    from .controlnet import ControlNet
    from .sd_pipeline import SDModels, attach_text_encoder
    from .unet import UNet2DCondition
    from .vae import AutoencoderKL

    dtype = jnp.bfloat16 if dtype is None else dtype
    root = Path(root)
    unet_params = convert_state_dict(_read_weights(root / "unet"), translate_unet_key, strict=True)
    vae_params = convert_state_dict(_read_weights(root / "vae"), translate_vae_key, strict=True)
    cn_dir = Path(controlnet_dir) if controlnet_dir else root / "controlnet"
    cn_params = convert_state_dict(_read_weights(cn_dir), translate_unet_key, strict=True)

    models = SDModels(
        unet=UNet2DCondition(dtype=dtype),
        controlnet=ControlNet(dtype=dtype),
        vae=AutoencoderKL(dtype=dtype),
        unet_params=unet_params,
        controlnet_params=cn_params,
        vae_params=vae_params,
    )
    te_dir = root / "text_encoder"
    models = attach_text_encoder(models, str(te_dir) if te_dir.exists() else None)
    try:
        from .tokenizer import CLIPTokenizer

        models.tokenizer = CLIPTokenizer.from_pretrained(root)
    except FileNotFoundError:
        pass  # weightless/test layout; pipeline falls back to simple_tokenize
    return models
