"""Correspondence-aware (epipolar) cross-view attention — the working idea of
the reference's CPAttn/MVDiffusion-style blocks (mv_depth_utils.py:24-213,
mv_modules.py:50-128; broken as shipped, SURVEY.md §2.2), rebuilt TPU-native.

For each pixel of view a, unproject its depth to a world point, reproject into
view b, and attend only to the 3×3 pixel neighborhood around the hit — with a
depth-consistency weight exp(−|z_reproj − depth_b|/σ) multiplied into the
attention logits. All views stay dense (B, S, …) tensors; the neighborhood
gather is a static 9-tap pattern, so the whole thing jits to gathers + one
small attention — no ragged structures.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera
from .geometry import depth_to_world_points, project_points

_OFFSETS = [(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]


def correspondence_weights(
    depth_a: jnp.ndarray,  # (H, W) view a depth
    cam_a: Camera,
    depth_b: jnp.ndarray,  # (H, W) view b depth
    cam_b: Camera,
    feat_hw: int,  # attention feature resolution (latent grid, e.g. 64)
    sigma: float = 0.1,
):
    """→ (S_a, 9) neighbor indices into view b's S_b tokens + (S_a, 9) weights.

    Indices are clamped; out-of-frustum or depth-inconsistent taps get ~0
    weight. S = feat_hw².
    """
    H, W = depth_a.shape
    stride = H // feat_hw
    # world points at feature-grid resolution (strided depth samples)
    d_a = depth_a[stride // 2 :: stride, stride // 2 :: stride][:feat_hw, :feat_hw]
    pts = depth_to_world_points(
        d_a,
        Camera(
            c2w=cam_a.c2w,
            fx=cam_a.fx / stride, fy=cam_a.fy / stride,
            cx=cam_a.cx / stride, cy=cam_a.cy / stride,
            width=feat_hw, height=feat_hw,
        ),
    )  # (f, f, 3)
    cam_b_s = Camera(
        c2w=cam_b.c2w,
        fx=cam_b.fx / stride, fy=cam_b.fy / stride,
        cx=cam_b.cx / stride, cy=cam_b.cy / stride,
        width=feat_hw, height=feat_hw,
    )
    xy_b, z_b = project_points(pts, cam_b_s)  # (f, f, 2), (f, f)
    d_b = depth_b[stride // 2 :: stride, stride // 2 :: stride][:feat_hw, :feat_hw]

    idxs, ws = [], []
    for ox, oy in _OFFSETS:
        xb = jnp.round(xy_b[..., 0]).astype(jnp.int32) + ox
        yb = jnp.round(xy_b[..., 1]).astype(jnp.int32) + oy
        inside = (xb >= 0) & (xb < feat_hw) & (yb >= 0) & (yb < feat_hw) & (z_b > 0)
        xb = jnp.clip(xb, 0, feat_hw - 1)
        yb = jnp.clip(yb, 0, feat_hw - 1)
        idx = yb * feat_hw + xb
        # depth consistency vs view b's own depth at the tap
        db = d_b[yb, xb]
        w = jnp.exp(-jnp.abs(z_b - db) / sigma) * inside
        idxs.append(idx.reshape(-1))
        ws.append(w.reshape(-1))
    return jnp.stack(idxs, axis=-1), jnp.stack(ws, axis=-1)  # (S, 9) each


def epipolar_attention(
    q: jnp.ndarray,  # (Hh, S, D) view-a queries (per head)
    k_b: jnp.ndarray,  # (Hh, S, D) view-b keys
    v_b: jnp.ndarray,  # (Hh, S, D) view-b values
    nbr_idx: jnp.ndarray,  # (S, 9)
    nbr_w: jnp.ndarray,  # (S, 9)
) -> jnp.ndarray:
    """Attend each view-a token to its 9 epipolar taps in view b."""
    kg = k_b[:, nbr_idx]  # (Hh, S, 9, D)
    vg = v_b[:, nbr_idx]
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("hsd,hsnd->hsn", q, kg) * scale
    logits = logits + jnp.log(jnp.maximum(nbr_w, 1e-12))[None]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("hsn,hsnd->hsd", probs, vg)


def make_epipolar_processor(
    nbr_idx: jnp.ndarray,  # (V, V, S, 9) pairwise neighbor indices
    nbr_w: jnp.ndarray,  # (V, V, S, 9) pairwise weights
    mix: float = 0.5,
    unet_chunk_size: int = 2,
):
    """Self-attn processor mixing in epipolar attention to every OTHER view.

    Batch layout = unet_chunk_size CFG groups × V views (same convention as
    the cross-view processor). Only layers whose sequence length matches the
    precomputed tables participate; others run plain attention.
    """
    from .attention import _sdpa

    V = nbr_idx.shape[0]
    S_tab = nbr_idx.shape[2]

    def processor(q, k, v, is_cross: bool) -> jnp.ndarray:
        B, Hh, S, D = q.shape
        if is_cross or S != S_tab or B % V != 0:
            return _sdpa(q, k, v)
        out_self = _sdpa(q, k, v)

        reps = B // V

        def one_batch(bi):
            g, a = bi // V, bi % V  # CFG group, view index
            acc = jnp.zeros((Hh, S, D))
            for b in range(V):
                if_same = 1.0 if b == a else 0.0  # skip self pairs via weight
                kb = k[g * V + b]
                vb = v[g * V + b]
                o = epipolar_attention(q[bi], kb, vb, nbr_idx[a, b], nbr_w[a, b])
                acc = acc + o * (1.0 - if_same)
            return acc / max(V - 1, 1)

        out_epi = jnp.stack([one_batch(bi) for bi in range(B)], axis=0)
        return mix * out_self + (1.0 - mix) * out_epi

    return processor


def overlap_ratio(nbr_w: jnp.ndarray, thresh: float = 0.05) -> jnp.ndarray:
    """(V, V, S, 9) tap weights → (V, V) fraction of view-a tokens with at
    least one valid epipolar tap in view b.

    The working idea behind the reference's overlap-ratio masking
    (mv_model.py:64-104): view pairs that barely see the same surface should
    not exchange attention."""
    return (nbr_w.max(axis=-1) > thresh).mean(axis=-1)


def make_multires_epipolar_processor(
    tables: dict,  # {S: (nbr_idx (V,V,S,9), nbr_w (V,V,S,9))}
    mix: float = 0.5,
    pair_mask: jnp.ndarray | None = None,  # (V, V) 1 = exchange attention
    unet_chunk_size: int = 2,
):
    """Epipolar cross-view attention at EVERY UNet attention resolution.

    The reference inserts a correspondence block after each down/mid/up block
    (CPBlock, mv_model.py:18-29,163-165,186-188,215-217); here the same
    coverage comes from one processor holding a table per sequence length —
    self-attn layers whose S matches a table mix in epipolar attention to
    every other (sufficiently overlapping, ``pair_mask``) view; other layers
    run plain attention."""
    from .attention import _sdpa

    some = next(iter(tables.values()))
    V = some[0].shape[0]
    if pair_mask is None:
        pair_mask = np.ones((V, V), np.float32)
    # pair_mask must be HOST-static (numpy): it selects which view pairs run
    # at all — a traced mask would force all pairs to run and mask after
    pm = np.asarray(pair_mask) * (1.0 - np.eye(V))  # never "self" pairs

    def processor(q, k, v, is_cross: bool) -> jnp.ndarray:
        B, Hh, S, D = q.shape
        if is_cross or S not in tables or B % V != 0:
            return _sdpa(q, k, v)
        nbr_idx, nbr_w = tables[S]
        out_self = _sdpa(q, k, v)

        def one_batch(bi):
            g, a = bi // V, bi % V
            acc = jnp.zeros((Hh, S, D), q.dtype)
            denom = max(float(pm[a].sum()), 1.0)
            for b in range(V):
                if pm[a, b] == 0.0:
                    continue
                o = epipolar_attention(
                    q[bi], k[g * V + b], v[g * V + b], nbr_idx[a, b], nbr_w[a, b]
                )
                acc = acc + o * float(pm[a, b])
            if float(pm[a].sum()) == 0.0:
                return out_self[bi]  # isolated view: pure self-attention
            return acc / denom

        out_epi = jnp.stack([one_batch(bi) for bi in range(B)], axis=0)
        return mix * out_self + (1.0 - mix) * out_epi

    return processor


def build_correspondence_tables(depths, cameras, feat_hw: int, sigma: float = 0.1):
    """depths: list of (H, W); cameras: list of Camera → (V, V, S, 9) tables."""
    V = len(depths)
    idx_rows, w_rows = [], []
    for a in range(V):
        idx_col, w_col = [], []
        for b in range(V):
            i, w = correspondence_weights(depths[a], cameras[a], depths[b], cameras[b], feat_hw, sigma)
            idx_col.append(i)
            w_col.append(w)
        idx_rows.append(jnp.stack(idx_col))
        w_rows.append(jnp.stack(w_col))
    return jnp.stack(idx_rows), jnp.stack(w_rows)
