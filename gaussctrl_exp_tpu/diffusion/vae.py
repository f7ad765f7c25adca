"""SD1.x VAE (AutoencoderKL) encoder/decoder — Flax linen, NHWC.

The reference uses the VAE for latent encode (×0.18215,
/root/reference/gaussctrl/ad_pipeline.py:247-254) and decode. SD1.x config:
block channels (128, 256, 512, 512), 2 layers/block, latent 4ch, mid
self-attention, GroupNorm(32)/SiLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

SCALING_FACTOR = 0.18215
VAE_BLOCK_OUT = (128, 256, 512, 512)


class VaeResnet(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if C != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VaeAttention(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        logits = (q @ k.transpose(0, 2, 1) * (C**-0.5)).astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)  # fp32 softmax under bf16
        h = nn.Dense(C, dtype=self.dtype, name="to_out_0")(probs @ v)
        return x + h.reshape(B, H, W, C)


class Encoder(nn.Module):
    block_out: tuple = VAE_BLOCK_OUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, 3) in [-1, 1]
        h = nn.Conv(self.block_out[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for bi, ch in enumerate(self.block_out):
            for li in range(2):
                h = VaeResnet(ch, dtype=self.dtype, name=f"down_{bi}_resnet_{li}")(h)
            if bi < len(self.block_out) - 1:
                h = nn.Conv(ch, (3, 3), strides=2, padding=((0, 1), (0, 1)), dtype=self.dtype,
                            name=f"down_{bi}_downsample")(h)
        h = VaeResnet(self.block_out[-1], dtype=self.dtype, name="mid_resnet_0")(h)
        h = VaeAttention(dtype=self.dtype, name="mid_attn")(h)
        h = VaeResnet(self.block_out[-1], dtype=self.dtype, name="mid_resnet_1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(8, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return nn.Conv(8, (1, 1), dtype=self.dtype, name="quant_conv")(h)  # mean ‖ logvar


class Decoder(nn.Module):
    block_out: tuple = VAE_BLOCK_OUT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):  # (B, h, w, 4)
        h = nn.Conv(4, (1, 1), dtype=self.dtype, name="post_quant_conv")(z)
        h = nn.Conv(self.block_out[-1], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)
        h = VaeResnet(self.block_out[-1], dtype=self.dtype, name="mid_resnet_0")(h)
        h = VaeAttention(dtype=self.dtype, name="mid_attn")(h)
        h = VaeResnet(self.block_out[-1], dtype=self.dtype, name="mid_resnet_1")(h)
        for bi, ch in enumerate(reversed(self.block_out)):
            for li in range(3):
                h = VaeResnet(ch, dtype=self.dtype, name=f"up_{bi}_resnet_{li}")(h)
            if bi < len(self.block_out) - 1:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name=f"up_{bi}_upsample")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    block_out: tuple = VAE_BLOCK_OUT
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out, dtype=self.dtype)
        self.decoder = Decoder(self.block_out, dtype=self.dtype)

    def encode_moments(self, x):
        return self.encoder(x)

    def encode(self, x, sample_key=None):
        """Image [-1,1] → scaled latent (mode of the posterior unless a key is
        given — the reference samples then scales, ad_pipeline.py:247-254)."""
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        if sample_key is not None:
            mean = mean + jnp.exp(0.5 * jnp.clip(logvar, -30, 20)) * jax.random.normal(
                sample_key, mean.shape
            )
        return mean * SCALING_FACTOR

    def decode(self, z):
        return self.decoder(z / SCALING_FACTOR)

    def __call__(self, x):  # for init
        return self.decode(self.encode(x))
