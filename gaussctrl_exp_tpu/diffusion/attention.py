"""Attention with pluggable processors — the TPU-shaped "attention processor".

In the reference, cross-view consistency ("AttnAlign") is injected by swapping
diffusers' attention processor (/root/reference/gaussctrl/utils.py:39-133 set
at ad_pipeline.py:169-174). Here the processor is an explicit function
``processor(q, k, v, is_cross) → out`` passed through the module call — no
global registry, jit-friendly.

``cross_view_processor`` reproduces CrossViewAttnProcessor exactly: for
self-attention layers, with the batch laid out as ``unet_chunk_size`` CFG
groups × V views, each view's queries additionally attend to the K/V of
reference views 0..3 of its group; the output mixes
``coeff·self + (1−coeff)·mean(ref0..ref3)`` (utils.py:94-117; coeff 0.6 in the
UNet, 0.0 in the ControlNet). Cross-attention (text) layers are untouched.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Processor = Callable[..., jnp.ndarray]

# Fused (flash) self-attention threshold: sequences at least this long go
# through the Pallas online-softmax kernel on TPU. The UNet's 64²-latent
# self-attention (S=4096) otherwise materializes (B, H, 4096, 4096) logits —
# ~4.8 GB of HBM traffic per layer at the CFG-18 edit batch — which dominates
# the measured 260 ms denoise step (BASELINE.md). Short sequences (16²/8²
# levels, 77-token text cross-attn) stay on the XLA path where fusion is fine.
FLASH_MIN_SEQ = 1024
_FLASH_BLOCK = 512


def _flash_sdpa(q, k, v):
    """Pallas TPU flash attention; pads head_dim to the 128-lane width (free on
    the MXU — the contraction dim is padded to 128 in hardware anyway; zero
    padding leaves logits unchanged and the padded output cols are sliced)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    B, H, S, D = q.shape
    T = k.shape[2]
    scale = D**-0.5
    Dp = max(128, (D + 127) // 128 * 128)
    if Dp != D:
        pad = ((0, 0), (0, 0), (0, 0), (0, Dp - D))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    bq = min(_FLASH_BLOCK, S)
    bkv = min(_FLASH_BLOCK, T)
    sizes = BlockSizes(
        block_q=bq, block_k_major=bkv, block_k=bkv, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkv, block_k_dkv=bkv,
        block_q_dkv=bq, block_k_major_dq=bkv, block_k_dq=bkv, block_q_dq=bq,
    )
    out = flash_attention(q, k, v, causal=False, sm_scale=scale, block_sizes=sizes)
    return out[..., :D]


def _use_flash(q, k) -> bool:
    # affirmative TPU gate: the Mosaic kernel lowers only on TPU backends
    # ("tpu", and the tunneled "axon" device which is a TPU) — any other
    # backend (cpu, gpu, ...) takes the XLA path
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # BlockSizes require both sequence axes to tile evenly by _FLASH_BLOCK
    return (
        q.shape[2] >= FLASH_MIN_SEQ
        and q.shape[2] % _FLASH_BLOCK == 0
        and k.shape[2] % _FLASH_BLOCK == 0
    )


def _sdpa(q, k, v):
    """(B, H, S, D) scaled dot-product attention (fp32 softmax)."""
    if _use_flash(q, k):
        return _flash_sdpa(q, k, v)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k) * scale
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)


def default_processor(q, k, v, is_cross: bool) -> jnp.ndarray:
    return _sdpa(q, k, v)


def make_cross_view_processor(
    self_attn_coeff: float, num_ref_views: int = 4, unet_chunk_size: int = 2
) -> Processor:
    def processor(q, k, v, is_cross: bool) -> jnp.ndarray:
        if is_cross:
            return _sdpa(q, k, v)
        B, H, S, D = q.shape
        V = B // unet_chunk_size  # views per CFG group
        out_self = _sdpa(q, k, v)

        # K/V of reference view r, broadcast to every view of the group
        kg = k.reshape(unet_chunk_size, V, H, S, D)
        vg = v.reshape(unet_chunk_size, V, H, S, D)
        ref_outs = []
        for r in range(num_ref_views):
            k_r = jnp.broadcast_to(kg[:, r : r + 1], kg.shape).reshape(B, H, S, D)
            v_r = jnp.broadcast_to(vg[:, r : r + 1], vg.shape).reshape(B, H, S, D)
            ref_outs.append(_sdpa(q, k_r, v_r))
        out_ref = jnp.mean(jnp.stack(ref_outs), axis=0)
        return self_attn_coeff * out_self + (1.0 - self_attn_coeff) * out_ref

    return processor


class Attention(nn.Module):
    """Multi-head attention matching diffusers' Attention (to_q/k/v, to_out)."""

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, context=None, processor: Optional[Processor] = None):
        is_cross = context is not None
        ctx = hidden_states if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(hidden_states)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        B, S, _ = q.shape
        T = k.shape[1]

        def split(x, L):
            return x.reshape(B, L, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q, S), split(k, T), split(v, T)
        proc = processor or default_processor
        out = proc(q, k, v, is_cross)
        out = out.transpose(0, 2, 1, 3).reshape(B, S, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        return out


class FeedForward(nn.Module):
    """GEGLU feed-forward (diffusers ff.net.0 proj + ff.net.2)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """attn1 (self, processor-pluggable) → attn2 (cross) → GEGLU ff."""

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, processor=None):
        x = x + Attention(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn1"
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(x), processor=processor)
        x = x + Attention(
            self.dim, self.heads, self.dim_head, self.cross_attention_dim,
            dtype=self.dtype, name="attn2",
        )(nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context=context, processor=processor)
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        return x


class Transformer2D(nn.Module):
    """GroupNorm → 1×1 proj_in → transformer blocks → proj_out + residual."""

    channels: int
    heads: int
    dim_head: int
    depth: int = 1
    cross_attention_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, processor=None):
        B, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = h.reshape(B, H * W, C)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.channels, self.heads, self.dim_head, self.cross_attention_dim,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(h, context, processor)
        h = nn.Dense(self.channels, dtype=self.dtype, name="proj_out")(h)
        return h.reshape(B, H, W, C) + residual
