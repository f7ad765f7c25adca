"""Stable-Diffusion 1.x UNet (Flax linen), with ControlNet residual inputs.

From-scratch re-implementation of the architecture the reference drives
through diffusers (/root/reference/gaussctrl/ad_pipeline.py:104-108):
4-ch 64×64 latents, block channels (320, 640, 1280, 1280), 2 resnets/block,
depth-1 transformers with 8 heads, cross-attention dim 768 (CLIP ViT-L/14),
SiLU + GroupNorm(32). Module names mirror diffusers' parameter paths so the
torch→Flax weight converter (convert.py) is a mechanical rename.

NHWC layout throughout (TPU-native); ``controlnet_residuals`` accepts the
(down_block_res_samples, mid_sample) tuple produced by controlnet.py, added
exactly where diffusers adds them.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .attention import Transformer2D

BLOCK_OUT = (320, 640, 1280, 1280)  # SD1.x defaults
LAYERS_PER_BLOCK = 2
HEADS = 8
CROSS_DIM = 768


def timestep_embedding(timesteps: jnp.ndarray, dim: int = 320) -> jnp.ndarray:
    """Sinusoidal embedding (diffusers Timesteps: flip_sin_to_cos=True,
    downscale_freq_shift=0)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        C = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if C != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.channels, (3, 3), strides=2, padding=1, dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNet2DCondition(nn.Module):
    """SD1.x UNet (dims configurable so tests can use a tiny instance)."""

    in_channels: int = 4
    out_channels: int = 4
    block_out: tuple = BLOCK_OUT
    layers_per_block: int = LAYERS_PER_BLOCK
    heads: int = HEADS
    cross_dim: int = CROSS_DIM
    temb_dim: int = 1280
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample,  # (B, H, W, 4)
        timesteps,  # (B,) int
        encoder_hidden_states,  # (B, 77, 768)
        processor=None,
        controlnet_residuals: Optional[Tuple[Sequence[jnp.ndarray], jnp.ndarray]] = None,
    ):
        temb = timestep_embedding(timesteps, self.block_out[0])
        temb = nn.Dense(self.temb_dim, dtype=self.dtype, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(self.temb_dim, dtype=self.dtype, name="time_embedding_linear_2")(nn.silu(temb))

        h = nn.Conv(self.block_out[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        res_stack = [h]

        # down blocks: 3× CrossAttnDown + 1× Down
        for bi, ch in enumerate(self.block_out):
            has_attn = bi < len(self.block_out) - 1
            for li in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype, name=f"down_{bi}_resnet_{li}")(h, temb)
                if has_attn:
                    h = Transformer2D(
                        ch, self.heads, max(ch // self.heads, 1), cross_attention_dim=self.cross_dim,
                        dtype=self.dtype, name=f"down_{bi}_attn_{li}",
                    )(h, encoder_hidden_states, processor)
                res_stack.append(h)
            if bi < len(self.block_out) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"down_{bi}_downsample")(h)
                res_stack.append(h)

        # mid
        h = ResnetBlock(self.block_out[-1], dtype=self.dtype, name="mid_resnet_0")(h, temb)
        h = Transformer2D(
            self.block_out[-1], self.heads, max(self.block_out[-1] // self.heads, 1), cross_attention_dim=self.cross_dim,
            dtype=self.dtype, name="mid_attn_0",
        )(h, encoder_hidden_states, processor)
        h = ResnetBlock(self.block_out[-1], dtype=self.dtype, name="mid_resnet_1")(h, temb)

        if controlnet_residuals is not None:
            down_res, mid_res = controlnet_residuals
            res_stack = [r + c for r, c in zip(res_stack, down_res)]
            h = h + mid_res

        # up blocks (reverse: 1× Up + 3× CrossAttnUp), 3 resnets each
        up_channels = list(reversed(self.block_out))  # (1280, 1280, 640, 320)
        for bi, ch in enumerate(up_channels):
            has_attn = bi > 0
            for li in range(self.layers_per_block + 1):
                skip = res_stack.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(ch, dtype=self.dtype, name=f"up_{bi}_resnet_{li}")(h, temb)
                if has_attn:
                    h = Transformer2D(
                        ch, self.heads, max(ch // self.heads, 1), cross_attention_dim=self.cross_dim,
                        dtype=self.dtype, name=f"up_{bi}_attn_{li}",
                    )(h, encoder_hidden_states, processor)
            if bi < len(up_channels) - 1:
                h = Upsample(ch, dtype=self.dtype, name=f"up_{bi}_upsample")(h)

        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
