"""Front-to-back alpha-blend rasterization — differentiable jnp reference path.

Replicates the per-pixel compositing loop of gsplat v0.1.2's
``rasterize_gaussians`` CUDA kernel (reference call sites
/root/reference/gaussctrl/gc_model.py:208-236):

    for g in depth order:               # only gaussians binned to this tile
        σ  = ½(c_a dx² + c_c dy²) + c_b dx dy
        skip if σ < 0
        α  = min(0.999, opac · e^{−σ});  skip if α < 1/255
        next_T = T·(1−α);  BREAK (without compositing) if next_T ≤ 1e-4
        out += α·T·color;  T = next_T
    out += T · background;  alpha_out = 1 − T

The sequential loop is re-expressed as dense, parallel tensor algebra (the
TPU-first move): with ``T_after = cumprod(1−α)`` along the per-tile depth-sorted
gaussian axis, the CUDA break is exactly the mask ``T_after > 1e-4`` (the
product is monotone non-increasing), compositing weights are
``w = α · T_excl · mask``, and the output is a (pixels × gaussians) @
(gaussians × channels) contraction — MXU work instead of a serial loop. The
Pallas kernel in blend_pallas.py implements the same algebra blockwise with
chunked early exit; this jnp version is its differentiable oracle and the
fallback path (autodiff gives the hand-derivable gradients for free here).

Depth is rendered as one extra channel in the same pass (the reference runs a
second rasterize for depth, gc_model.py:225-236 — output parity, not mechanism).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .binning import TileBins
from .projection import BLOCK

ALPHA_CLAMP = 0.999
MIN_ALPHA = 1.0 / 255.0
T_EPS = 1e-4


class BlendOutputs(NamedTuple):
    img: jnp.ndarray  # (H, W, C) composited channels (no background added)
    final_T: jnp.ndarray  # (H, W) remaining transmittance
    # alpha = 1 - final_T; caller adds final_T * background to color channels


def _pixel_grid(tiles_x: int, tile_ids: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """tile ids (B,) → pixel coords (B, BLOCK*BLOCK) (gsplat uses integer px/py)."""
    ty = tile_ids // tiles_x
    tx = tile_ids % tiles_x
    dy = jnp.arange(BLOCK, dtype=jnp.float32)
    dx = jnp.arange(BLOCK, dtype=jnp.float32)
    py = ty[:, None, None] * BLOCK + dy[None, :, None]  # (B, BLOCK, 1)
    px = tx[:, None, None] * BLOCK + dx[None, None, :]  # (B, 1, BLOCK)
    py = jnp.broadcast_to(py, (tile_ids.shape[0], BLOCK, BLOCK)).reshape(-1, BLOCK * BLOCK)
    px = jnp.broadcast_to(px, (tile_ids.shape[0], BLOCK, BLOCK)).reshape(-1, BLOCK * BLOCK)
    return px, py


def blend_weights(
    alpha_eff: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Core compositing algebra shared by oracle and tiled paths.

    alpha_eff: (..., G) effective alphas in depth order (0 where skipped).
    Returns (w, final_T): w (..., G) per-gaussian compositing weights
    α·T_excl·composited, final_T (...,) frozen background transmittance.
    """
    one_m = 1.0 - alpha_eff
    T_after = jnp.cumprod(one_m, axis=-1)
    T_excl = T_after / one_m  # safe: alpha ≤ 0.999 ⇒ one_m ≥ 0.001
    composited = (T_after > T_EPS) & (alpha_eff > 0.0)
    w = jnp.where(composited, alpha_eff * T_excl, 0.0)
    final_T = jnp.min(jnp.where(composited, T_after, 1.0), axis=-1)
    return w, final_T


def rasterize_tiles_jnp(
    xys_sorted: jnp.ndarray,  # (N, 2) depth-sorted
    conics_sorted: jnp.ndarray,  # (N, 3)
    colors_sorted: jnp.ndarray,  # (N, C)
    opacs_sorted: jnp.ndarray,  # (N,)
    bins: TileBins,
    img_height: int,
    img_width: int,
    max_per_tile: int,
    tile_chunk: int = 32,
) -> BlendOutputs:
    """Blend all tiles with a static per-tile gaussian cap ``max_per_tile``.

    Differentiable via autodiff (gather → scatter-add in the backward). Tiles
    are processed in chunks with ``lax.map`` to bound the (B, P, K) working set.
    """
    tiles_x = (img_width + BLOCK - 1) // BLOCK
    tiles_y = (img_height + BLOCK - 1) // BLOCK
    num_tiles = tiles_x * tiles_y
    C = colors_sorted.shape[-1]
    K = max_per_tile
    P = BLOCK * BLOCK

    def tile_batch(tile_ids: jnp.ndarray):
        B = tile_ids.shape[0]
        start = bins.tile_start[tile_ids]  # (B,)
        cnt = bins.tile_cnt[tile_ids]
        ks = jnp.arange(K, dtype=jnp.int32)
        slot = start[:, None] + ks[None, :]  # (B, K)
        in_range = ks[None, :] < jnp.minimum(cnt, K)[:, None]
        slot = jnp.clip(slot, 0, bins.capacity - 1)
        g = bins.sorted_rank[slot]  # (B, K) ranks into sorted arrays
        xy = xys_sorted[g]  # (B, K, 2)
        con = conics_sorted[g]  # (B, K, 3)
        col = colors_sorted[g]  # (B, K, C)
        opa = opacs_sorted[g]  # (B, K)

        px, py = _pixel_grid(tiles_x, tile_ids)  # (B, P)
        dx = xy[:, None, :, 0] - px[:, :, None]  # (B, P, K)
        dy = xy[:, None, :, 1] - py[:, :, None]
        ca, cb, cc = con[:, None, :, 0], con[:, None, :, 1], con[:, None, :, 2]
        sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP, opa[:, None, :] * jnp.exp(-sigma))
        skip = (sigma < 0.0) | (alpha < MIN_ALPHA) | (~in_range[:, None, :])
        alpha_eff = jnp.where(skip, 0.0, alpha)

        w, final_T = blend_weights(alpha_eff)  # (B, P, K), (B, P)
        img = jnp.einsum("bpk,bkc->bpc", w, col)  # MXU contraction
        return img, final_T

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    pad = (-num_tiles) % tile_chunk
    tile_ids = jnp.concatenate([tile_ids, jnp.zeros((pad,), jnp.int32)])
    img, final_T = jax.lax.map(tile_batch, tile_ids.reshape(-1, tile_chunk))
    img = img.reshape(-1, P, C)[:num_tiles]
    final_T = final_T.reshape(-1, P)[:num_tiles]

    # stitch tiles → image
    img = img.reshape(tiles_y, tiles_x, BLOCK, BLOCK, C)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * BLOCK, tiles_x * BLOCK, C)
    final_T = final_T.reshape(tiles_y, tiles_x, BLOCK, BLOCK)
    final_T = final_T.transpose(0, 2, 1, 3).reshape(tiles_y * BLOCK, tiles_x * BLOCK)
    return BlendOutputs(img=img[:img_height, :img_width], final_T=final_T[:img_height, :img_width])


def rasterize_naive(
    xys: jnp.ndarray,
    depths: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacs: jnp.ndarray,
    mask: jnp.ndarray,
    tile_bbox: jnp.ndarray,
    img_height: int,
    img_width: int,
) -> BlendOutputs:
    """O(N·pixels) oracle: every pixel blends every gaussian whose tile bbox
    covers the pixel's tile, in global depth order. For small test scenes only —
    the ground truth both the tiled jnp path and the Pallas kernel must match.
    """
    N = xys.shape[0]
    order = jnp.argsort(jnp.where(mask, depths, jnp.inf))
    xy = xys[order]
    con = conics[order]
    col = colors[order]
    opa = opacs[order]
    bb = tile_bbox[order]
    msk = mask[order]

    ys = jnp.arange(img_height, dtype=jnp.float32)
    xs = jnp.arange(img_width, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    ptx = (px / BLOCK).astype(jnp.int32)  # pixel's tile coords
    pty = (py / BLOCK).astype(jnp.int32)

    def per_row(py_row, px_row, ptx_row, pty_row):
        dx = xy[None, :, 0] - px_row[:, None]  # (W, N)
        dy = xy[None, :, 1] - py_row[:, None]
        sigma = 0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy) + con[None, :, 1] * dx * dy
        alpha = jnp.minimum(ALPHA_CLAMP, opa[None, :] * jnp.exp(-sigma))
        covered = (
            (ptx_row[:, None] >= bb[None, :, 0])
            & (ptx_row[:, None] < bb[None, :, 2])
            & (pty_row[:, None] >= bb[None, :, 1])
            & (pty_row[:, None] < bb[None, :, 3])
        )
        skip = (sigma < 0.0) | (alpha < MIN_ALPHA) | ~covered | ~msk[None, :]
        alpha_eff = jnp.where(skip, 0.0, alpha)
        w, final_T = blend_weights(alpha_eff)
        return w @ col, final_T  # (W, C), (W,)

    img, final_T = jax.lax.map(lambda args: per_row(*args), (py, px, ptx, pty))
    return BlendOutputs(img=img, final_T=final_T)
