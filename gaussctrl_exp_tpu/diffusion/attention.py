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


def _sdpa(q, k, v):
    """(B, H, S, D) scaled dot-product attention (fp32 softmax)."""
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
