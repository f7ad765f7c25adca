"""Segment Anything (SAM) in Flax — image encoder ViT, prompt encoder, mask decoder.

From-scratch re-implementation of the architecture the reference drives
through the ``segment_anything`` package (/root/reference/gaussctrl/lang_sam.py:12-13,
58-82: SAM ViT-H, box-prompted ``SamPredictor``). Module/parameter names
mirror the torch checkpoints (``image_encoder.blocks.0.attn.qkv`` …) so the
torch→Flax converter (segmentation/convert.py) is a mechanical rename, the
same pattern as the diffusion stack.

TPU notes: NHWC throughout; window attention is static-shape (pad → reshape,
no dynamic slicing); the 2×2-stride-2 transposed convs in the mask-decoder
upscaler are written as einsum+reshape (exact, no conv-transpose kernel-flip
convention trap).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    """ViT-H operating point by default (lang_sam.py uses sam_vit_h_4b8939)."""

    img_size: int = 1024
    patch_size: int = 16
    encoder_dim: int = 1280
    encoder_depth: int = 32
    encoder_heads: int = 16
    encoder_global_attn: Tuple[int, ...] = (7, 15, 23, 31)
    window_size: int = 14
    prompt_dim: int = 256  # embedding dim of prompts & image neck
    decoder_depth: int = 2
    decoder_heads: int = 8
    decoder_downsample: int = 2  # attention_downsample_rate
    num_multimask: int = 3
    mlp_ratio: float = 4.0

    @property
    def embed_hw(self) -> int:
        return self.img_size // self.patch_size


def vit_b_config() -> SAMConfig:
    return SAMConfig(encoder_dim=768, encoder_depth=12, encoder_heads=12,
                     encoder_global_attn=(2, 5, 8, 11))


def vit_l_config() -> SAMConfig:
    return SAMConfig(encoder_dim=1024, encoder_depth=24, encoder_heads=16,
                     encoder_global_attn=(5, 11, 17, 23))


class LayerNorm2d(nn.Module):
    """SAM's channel LayerNorm (eps 1e-6), NHWC here."""

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-6) * w + b


def _rel_pos_bias(rel_table: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """(2·max−1, head_dim) table → (q, k, head_dim) decomposed rel-pos slice."""
    coords = jnp.arange(q_size)[:, None] - jnp.arange(k_size)[None, :] + (k_size - 1)
    return rel_table[coords]


class ViTAttention(nn.Module):
    """Multi-head attention with decomposed relative positions (SAM encoder)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C)
        B, H, W, C = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x.reshape(B, H * W, C))
        qkv = qkv.reshape(B, H * W, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B, heads, HW, hd)
        attn = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd)

        rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * H - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * W - 1, hd))
        Rh = _rel_pos_bias(rel_h, H, H)  # (H, H, hd)
        Rw = _rel_pos_bias(rel_w, W, W)
        qr = q.reshape(B, self.heads, H, W, hd)
        bias_h = jnp.einsum("bnhwc,hkc->bnhwk", qr, Rh)
        bias_w = jnp.einsum("bnhwc,wkc->bnhwk", qr, Rw)
        attn = attn.reshape(B, self.heads, H, W, H, W)
        attn = attn + bias_h[..., :, None] + bias_w[..., None, :]
        attn = attn.reshape(B, self.heads, H * W, H * W)

        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class ViTBlock(nn.Module):
    dim: int
    heads: int
    mlp_ratio: float
    window: int  # 0 = global attention

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window > 0:
            w = self.window
            ph, pw = (-H) % w, (-W) % w
            h = jnp.pad(h, ((0, 0), (0, ph), (0, pw), (0, 0)))
            Hp, Wp = H + ph, W + pw
            h = h.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(B * (Hp // w) * (Wp // w), w, w, C)
        h = ViTAttention(self.dim, self.heads, name="attn")(h)
        if self.window > 0:
            w = self.window
            h = h.reshape(B, Hp // w, Wp // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
            h = h.reshape(B, Hp, Wp, C)[:, :H, :W]
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp.lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="mlp.lin2")(h)
        return x + h


class ImageEncoderViT(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, x):  # (B, img, img, 3) normalized
        c = self.cfg
        x = nn.Conv(c.encoder_dim, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embed.proj")(x)
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, c.embed_hw, c.embed_hw, c.encoder_dim))
        x = x + pos
        for i in range(c.encoder_depth):
            win = 0 if i in c.encoder_global_attn else c.window_size
            x = ViTBlock(c.encoder_dim, c.encoder_heads, c.mlp_ratio, win,
                         name=f"blocks.{i}")(x)
        # neck → prompt_dim channels
        x = nn.Conv(c.prompt_dim, (1, 1), use_bias=False, name="neck.0")(x)
        x = LayerNorm2d(name="neck.1")(x)
        x = nn.Conv(c.prompt_dim, (3, 3), padding=1, use_bias=False, name="neck.2")(x)
        x = LayerNorm2d(name="neck.3")(x)
        return x  # (B, embed_hw, embed_hw, prompt_dim)


def _pe_encode(coords01: jnp.ndarray, gaussian: jnp.ndarray) -> jnp.ndarray:
    """PositionEmbeddingRandom: [0,1] coords → (…, 2·feat) sin/cos features."""
    c = (2.0 * coords01 - 1.0) @ gaussian  # (..., feat)
    c = 2.0 * np.pi * c
    return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class PromptEncoder(nn.Module):
    """Sparse (points/boxes) prompt embeddings + dense no-mask embedding.

    Matches segment_anything's PromptEncoder: 4 learned point embeddings
    (neg, pos, box-corner-1, box-corner-2), a not-a-point embedding, a
    random-gaussian positional encoder shared with the decoder's dense PE.
    """

    cfg: SAMConfig

    def setup(self):
        d = self.cfg.prompt_dim
        self.pe_gaussian = self.param(
            "pe_layer.positional_encoding_gaussian_matrix",
            lambda k, s: jax.random.normal(k, s), (2, d // 2))
        self.point_embeddings = [
            self.param(f"point_embeddings.{i}.weight", nn.initializers.normal(1.0), (1, d))
            for i in range(4)
        ]
        self.not_a_point_embed = self.param(
            "not_a_point_embed.weight", nn.initializers.normal(1.0), (1, d))
        self.no_mask_embed = self.param(
            "no_mask_embed.weight", nn.initializers.normal(1.0), (1, d))

    def embed_points(self, points, labels):
        """points: (B, P, 2) pixel coords; labels: (B, P) 1 pos / 0 neg / −1 pad."""
        pts = (points + 0.5) / self.cfg.img_size
        pe = _pe_encode(pts, self.pe_gaussian)
        pe = jnp.where((labels == -1)[..., None], self.not_a_point_embed[0], pe)
        pe = pe + jnp.where((labels == 1)[..., None], self.point_embeddings[1][0],
                            jnp.where((labels == 0)[..., None],
                                      self.point_embeddings[0][0], 0.0))
        return pe

    def embed_boxes(self, boxes):
        """boxes: (B, 4) xyxy pixels → (B, 2, prompt_dim) corner embeddings."""
        corners = boxes.reshape(-1, 2, 2)
        pts = (corners + 0.5) / self.cfg.img_size
        pe = _pe_encode(pts, self.pe_gaussian)
        pe = pe.at[:, 0, :].add(self.point_embeddings[2][0])
        pe = pe.at[:, 1, :].add(self.point_embeddings[3][0])
        return pe

    def dense_pe(self) -> jnp.ndarray:
        """(embed_hw, embed_hw, prompt_dim) positional grid for the decoder."""
        hw = self.cfg.embed_hw
        g = (jnp.arange(hw, dtype=jnp.float32) + 0.5) / hw
        coords = jnp.stack(jnp.meshgrid(g, g, indexing="xy"), axis=-1)  # (hw,hw,2) x,y
        return _pe_encode(coords, self.pe_gaussian)

    def __call__(self, points=None, labels=None, boxes=None):
        parts = []
        if points is not None:
            parts.append(self.embed_points(points, labels))
        if boxes is not None:
            parts.append(self.embed_boxes(boxes))
        sparse = jnp.concatenate(parts, axis=1) if parts else jnp.zeros(
            (1, 0, self.cfg.prompt_dim))
        dense = self.no_mask_embed.reshape(1, 1, 1, -1)
        return sparse, dense


class DecoderAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.dim // self.downsample
        hd = d // self.heads
        qp = nn.Dense(d, name="q_proj")(q).reshape(*q.shape[:-1], self.heads, hd)
        kp = nn.Dense(d, name="k_proj")(k).reshape(*k.shape[:-1], self.heads, hd)
        vp = nn.Dense(d, name="v_proj")(v).reshape(*v.shape[:-1], self.heads, hd)
        attn = jnp.einsum("bqhc,bkhc->bhqk", qp, kp) / np.sqrt(hd)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhc->bqhc", attn, vp).reshape(*q.shape[:-1], d)
        return nn.Dense(self.dim, name="out_proj")(out)


class TwoWayBlock(nn.Module):
    cfg: SAMConfig
    skip_first_layer_pe: bool

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        c = self.cfg
        if self.skip_first_layer_pe:
            queries = DecoderAttention(c.prompt_dim, c.decoder_heads,
                                       name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + DecoderAttention(c.prompt_dim, c.decoder_heads,
                                                 name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(name="norm1")(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + DecoderAttention(
            c.prompt_dim, c.decoder_heads, c.decoder_downsample,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="norm2")(queries)
        h = nn.Dense(2048 if c.prompt_dim == 256 else c.prompt_dim * 8,
                     name="mlp.lin1")(queries)
        h = nn.relu(h)
        queries = queries + nn.Dense(c.prompt_dim, name="mlp.lin2")(h)
        queries = nn.LayerNorm(name="norm3")(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + DecoderAttention(
            c.prompt_dim, c.decoder_heads, c.decoder_downsample,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(name="norm4")(keys)
        return queries, keys


class MLP(nn.Module):
    hidden: int
    out: int
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f"layers.{i}")(x))
        return nn.Dense(self.out, name=f"layers.{self.layers - 1}")(x)


class MaskDecoder(nn.Module):
    cfg: SAMConfig

    @nn.compact
    def __call__(self, image_embedding, image_pe, sparse_prompt, dense_prompt):
        """image_embedding: (B, hw, hw, D); sparse_prompt: (B, P, D);
        dense_prompt broadcastable to image_embedding.
        Returns (low_res_masks (B, 1+multi, 4·hw, 4·hw), iou_pred (B, 1+multi))."""
        c = self.cfg
        n_tokens = 1 + c.num_multimask
        iou_token = self.param("iou_token.weight", nn.initializers.normal(1.0),
                               (1, c.prompt_dim))
        mask_tokens = self.param("mask_tokens.weight", nn.initializers.normal(1.0),
                                 (n_tokens, c.prompt_dim))
        B = sparse_prompt.shape[0]
        out_tokens = jnp.tile(
            jnp.concatenate([iou_token, mask_tokens], axis=0)[None], (B, 1, 1))
        tokens = jnp.concatenate([out_tokens, sparse_prompt], axis=1)

        src = image_embedding + dense_prompt
        hw = src.shape[1]
        keys = src.reshape(B, hw * hw, c.prompt_dim)
        key_pe = jnp.broadcast_to(
            image_pe.reshape(1, hw * hw, c.prompt_dim), keys.shape)

        queries = tokens
        for i in range(c.decoder_depth):
            queries, keys = TwoWayBlock(
                c, skip_first_layer_pe=(i == 0), name=f"transformer.layers.{i}"
            )(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + DecoderAttention(
            c.prompt_dim, c.decoder_heads, c.decoder_downsample,
            name="transformer.final_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(name="transformer.norm_final_attn")(queries)

        iou_out = queries[:, 0]
        mask_out = queries[:, 1 : 1 + n_tokens]

        # output upscaling: two 2×2-stride-2 transposed convs as einsum+reshape
        src2 = keys.reshape(B, hw, hw, c.prompt_dim)
        src2 = _up2x(src2, c.prompt_dim // 4, self, "output_upscaling.0")
        src2 = LayerNorm2d(name="output_upscaling.1")(src2)
        src2 = nn.gelu(src2, approximate=False)
        src2 = _up2x(src2, c.prompt_dim // 8, self, "output_upscaling.3")
        src2 = nn.gelu(src2, approximate=False)  # (B, 4hw, 4hw, D/8)

        hyper = jnp.stack(
            [MLP(c.prompt_dim, c.prompt_dim // 8,
                 name=f"output_hypernetworks_mlps.{i}")(mask_out[:, i])
             for i in range(n_tokens)], axis=1)  # (B, n_tokens, D/8)
        masks = jnp.einsum("bnc,bhwc->bnhw", hyper, src2)
        iou_pred = MLP(c.prompt_dim, n_tokens, name="iou_prediction_head")(iou_out)
        return masks, iou_pred


def _up2x(x, out_ch, mod: nn.Module, name: str):
    """2×2-stride-2 transposed conv: out[2i+di,2j+dj] = Σc x[i,j,c]·W[c,o,di,dj]."""
    C = x.shape[-1]
    W = mod.param(f"{name}.weight", nn.initializers.lecun_normal(), (C, out_ch, 2, 2))
    b = mod.param(f"{name}.bias", nn.initializers.zeros, (out_ch,))
    B, H, Wd, _ = x.shape
    y = jnp.einsum("bhwc,codx->bhdwxo", x, W.transpose(0, 1, 2, 3))
    # axes: b, h, di, w, dj, o → interleave
    y = y.reshape(B, H * 2, Wd * 2, out_ch)
    return y + b


class SAM(nn.Module):
    """Full SAM: encode once, prompt many times (matches SamPredictor usage,
    lang_sam.py:115-121)."""

    cfg: SAMConfig = SAMConfig()

    def setup(self):
        self.image_encoder = ImageEncoderViT(self.cfg, name="image_encoder")
        self.prompt_encoder = PromptEncoder(self.cfg, name="prompt_encoder")
        self.mask_decoder = MaskDecoder(self.cfg, name="mask_decoder")

    def encode_image(self, image):
        return self.image_encoder(image)

    def predict_boxes(self, image_embedding, boxes, multimask: bool = False):
        """boxes: (B, 4) xyxy in model-input pixel coords."""
        sparse, dense = self.prompt_encoder(boxes=boxes)
        image_pe = self.prompt_encoder.dense_pe()
        masks, iou = self.mask_decoder(image_embedding, image_pe, sparse, dense)
        if multimask:
            return masks[:, 1:], iou[:, 1:]
        return masks[:, :1], iou[:, :1]

    def __call__(self, image, boxes):
        emb = self.encode_image(image)
        return self.predict_boxes(emb, boxes)


# ImageNet-ish normalization SAM uses (pixel_mean/std in the torch ckpt)
PIXEL_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], np.float32)


def preprocess_image(img_uint8: np.ndarray, img_size: int) -> tuple[np.ndarray, float]:
    """Resize longest side to img_size, normalize, pad square (SamPredictor).
    Returns (batch (1, S, S, 3), scale factor original→model pixels)."""
    from PIL import Image

    h, w = img_uint8.shape[:2]
    scale = img_size / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = np.asarray(
        Image.fromarray(img_uint8).resize((nw, nh), Image.BILINEAR), np.float32)
    norm = (resized - PIXEL_MEAN) / PIXEL_STD
    out = np.zeros((img_size, img_size, 3), np.float32)
    out[:nh, :nw] = norm
    return out[None], scale


def postprocess_masks(low_res: jnp.ndarray, scale: float, out_hw: tuple[int, int],
                      img_size: int = 1024):
    """Upsample low-res logits to the original image size (bilinear) and crop
    the padding, then threshold at 0 (SamPredictor.postprocess_masks)."""
    B, n, h, w = low_res.shape
    S = img_size  # model input size
    up = jax.image.resize(low_res, (B, n, S, S), "bilinear")
    oh, ow = out_hw
    nh, nw = int(round(oh * scale)), int(round(ow * scale))
    up = up[:, :, :nh, :nw]
    up = jax.image.resize(up, (B, n, oh, ow), "bilinear")
    return up > 0.0
