"""ControlNet (depth) for the SD1.x UNet — Flax linen, NHWC.

From-scratch re-implementation of the architecture the reference loads as
``lllyasviel/sd-controlnet-depth`` (/root/reference/gaussctrl/ad_pipeline.py:104):
a copy of the UNet's down+mid trunk, a conditioning-embedding conv stack for
the 3-channel hint (the disparity maps ad_pipeline.py:256-274 produces), and
zero-initialized 1×1 projections for every residual it feeds back into the
UNet. Output scaling = ``controlnet_conditioning_scale`` (1.0 in the
reference, ad_pipeline.py "self.controlnet_conditioning_scale = 1.0").
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .attention import Transformer2D
from .unet import BLOCK_OUT, CROSS_DIM, HEADS, LAYERS_PER_BLOCK, Downsample, ResnetBlock, timestep_embedding


class ConditioningEmbedding(nn.Module):
    """3-ch hint image → base-ch feature at latent resolution (conv stack /8)."""

    chans: tuple = (16, 32, 96, 256)
    out_ch: int = 320
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hint):  # (B, H, W, 3) at image resolution
        chans = self.chans
        h = nn.Conv(chans[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(hint)
        h = nn.silu(h)
        for i in range(len(chans) - 1):
            h = nn.Conv(chans[i], (3, 3), padding=1, dtype=self.dtype, name=f"blocks_{2*i}")(h)
            h = nn.silu(h)
            h = nn.Conv(chans[i + 1], (3, 3), strides=2, padding=1, dtype=self.dtype,
                        name=f"blocks_{2*i+1}")(h)
            h = nn.silu(h)
        return nn.Conv(
            self.out_ch, (3, 3), padding=1, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="conv_out",
        )(h)


class ControlNet(nn.Module):
    block_out: tuple = BLOCK_OUT
    layers_per_block: int = LAYERS_PER_BLOCK
    heads: int = HEADS
    cross_dim: int = CROSS_DIM
    temb_dim: int = 1280
    cond_chans: tuple = (16, 32, 96, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample,  # (B, h, w, 4) latent
        timesteps,
        encoder_hidden_states,
        hint,  # (B, H, W, 3) conditioning image (H = 8h)
        conditioning_scale: float = 1.0,
        processor=None,
    ) -> Tuple[Sequence[jnp.ndarray], jnp.ndarray]:
        temb = timestep_embedding(timesteps, self.block_out[0])
        temb = nn.Dense(self.temb_dim, dtype=self.dtype, name="time_embedding_linear_1")(temb)
        temb = nn.Dense(self.temb_dim, dtype=self.dtype, name="time_embedding_linear_2")(nn.silu(temb))

        h = nn.Conv(self.block_out[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)
        h = h + ConditioningEmbedding(self.cond_chans, self.block_out[0], dtype=self.dtype, name="controlnet_cond_embedding")(hint)

        def zero_conv(x, name):
            return nn.Conv(
                x.shape[-1], (1, 1), dtype=self.dtype,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros, name=name,
            )(x)

        down_res = [zero_conv(h, "controlnet_down_blocks_0")]
        zi = 1
        for bi, ch in enumerate(self.block_out):
            has_attn = bi < len(self.block_out) - 1
            for li in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype, name=f"down_{bi}_resnet_{li}")(h, temb)
                if has_attn:
                    h = Transformer2D(
                        ch, self.heads, max(ch // self.heads, 1), cross_attention_dim=self.cross_dim,
                        dtype=self.dtype, name=f"down_{bi}_attn_{li}",
                    )(h, encoder_hidden_states, processor)
                down_res.append(zero_conv(h, f"controlnet_down_blocks_{zi}"))
                zi += 1
            if bi < len(self.block_out) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"down_{bi}_downsample")(h)
                down_res.append(zero_conv(h, f"controlnet_down_blocks_{zi}"))
                zi += 1

        h = ResnetBlock(self.block_out[-1], dtype=self.dtype, name="mid_resnet_0")(h, temb)
        h = Transformer2D(
            self.block_out[-1], self.heads, max(self.block_out[-1] // self.heads, 1), cross_attention_dim=self.cross_dim,
            dtype=self.dtype, name="mid_attn_0",
        )(h, encoder_hidden_states, processor)
        h = ResnetBlock(self.block_out[-1], dtype=self.dtype, name="mid_resnet_1")(h, temb)
        mid_res = nn.Conv(
            h.shape[-1], (1, 1), dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="controlnet_mid_block",
        )(h)

        down_res = [r * conditioning_scale for r in down_res]
        return down_res, mid_res * conditioning_scale
