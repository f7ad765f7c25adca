"""LPIPS perceptual loss (VGG16 backbone) — architecture + weight loader.

The reference's model config enables an LPIPS term (use_lpips / patch_size 32
/ lpips_loss_mult, /root/reference/gaussctrl/gc_model.py:59-70, imported from
torchmetrics at gc_model.py:25). Pretrained VGG16 + LPIPS linear weights are
not bundled in this environment (no network), so this module provides the
full architecture and a torch→Flax converter; pass a checkpoint to
``load_lpips`` at deployment, or use ``lpips_random`` for shape-level tests.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config (conv channels per block, pre-pool)
_VGG_BLOCKS = ((64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))
# ImageNet normalization LPIPS uses (its "scaling layer")
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the 5 pre-pool ReLU activations."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        feats = []
        ci = 0
        for bi, widths in enumerate(_VGG_BLOCKS):
            for w in widths:
                x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype, name=f"conv_{ci}")(x)
                x = nn.relu(x)
                ci += 1
            feats.append(x)
            if bi < len(_VGG_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """LPIPS distance: normalized VGG features, per-layer 1×1 linear heads."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        """(B, H, W, 3) images in [0, 1] → (B,) perceptual distances."""
        def norm_input(x):
            x = x * 2.0 - 1.0
            return (x - _SHIFT) / _SCALE

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fa = vgg(norm_input(a))
        fb = vgg(norm_input(b))
        total = 0.0
        for li, (xa, xb) in enumerate(zip(fa, fb)):
            xa = xa / jnp.maximum(jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10)
            xb = xb / jnp.maximum(jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10)
            diff = (xa - xb) ** 2
            w = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype, name=f"lin_{li}")(diff)
            total = total + jnp.mean(w, axis=(1, 2, 3))
        return total


def lpips_random(key=None):
    """Random-weight LPIPS (tests / shape checks only)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    model = LPIPS()
    params = model.init(key, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))["params"]
    return model, params


def convert_torch_lpips(vgg_state: dict, lin_state: dict) -> dict:
    """torchvision VGG16 ``features.*`` + LPIPS ``lin*.model.1.weight`` →
    Flax params tree for :class:`LPIPS`."""
    params: dict = {"vgg": {}}
    conv_idx = 0
    for k in sorted(vgg_state, key=lambda s: int(s.split(".")[1])):
        if not k.endswith("weight") or "features" not in k:
            continue
        w = np.asarray(vgg_state[k])
        if w.ndim != 4:
            continue
        b = np.asarray(vgg_state[k.replace("weight", "bias")])
        params["vgg"][f"conv_{conv_idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0).astype(np.float32),
            "bias": b.astype(np.float32),
        }
        conv_idx += 1
    for li in range(5):
        for name in (f"lin{li}.model.1.weight", f"lins.{li}.model.1.weight"):
            if name in lin_state:
                w = np.asarray(lin_state[name])  # (1, C, 1, 1)
                params[f"lin_{li}"] = {"kernel": w.transpose(2, 3, 1, 0).astype(np.float32)}
                break
    return params


def load_lpips(vgg_path: str, lin_path: str):
    """Load torch checkpoints (torchvision vgg16 state_dict + LPIPS lins)."""
    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu")
    lin_sd = torch.load(lin_path, map_location="cpu")
    vgg_sd = {k: v.numpy() for k, v in vgg_sd.items()}
    lin_sd = {k: v.numpy() for k, v in lin_sd.items()}
    return LPIPS(), convert_torch_lpips(vgg_sd, lin_sd)
