"""TriPlane attention processor — the working idea of the reference's
experimental ``TriPlaneAttnProcessor`` (/root/reference/gaussctrl/mv_pointnet.py,
hooked in at gc_pipeline.py:329-331), rebuilt TPU-native.

Per self-attention layer, each view's per-pixel hidden states are scattered
(mean-pooled) onto three axis-aligned feature planes at the world points
obtained by depth back-projection (the torch version uses torch_scatter's
``scatter_mean``; here ``jax.ops.segment_sum`` — SURVEY.md §2.3), re-sampled
per pixel bilinearly, and attended: out = mix·self_attn + (1−mix)·attn(q →
triplane features). World points are normalized by ``bbox_length`` (8.0 in the
reference, gc_pipeline.py:330).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .attention import _sdpa


def scatter_mean_plane(feats: jnp.ndarray, uv: jnp.ndarray, res: int) -> jnp.ndarray:
    """feats (S, C), uv (S, 2) in [0, 1) → (res*res, C) mean-pooled plane."""
    idx = (
        jnp.clip((uv[:, 1] * res).astype(jnp.int32), 0, res - 1) * res
        + jnp.clip((uv[:, 0] * res).astype(jnp.int32), 0, res - 1)
    )
    summed = jax.ops.segment_sum(feats, idx, num_segments=res * res)
    counts = jax.ops.segment_sum(jnp.ones((feats.shape[0],)), idx, num_segments=res * res)
    return summed / jnp.maximum(counts, 1.0)[:, None]


def sample_plane(plane: jnp.ndarray, uv: jnp.ndarray, res: int) -> jnp.ndarray:
    """(res*res, C) plane, uv (S, 2) in [0, 1) → (S, C) bilinear samples."""
    from .geometry import bilinear_sample

    grid = plane.reshape(res, res, -1)
    return bilinear_sample(grid, uv * res - 0.5)


def make_triplane_processor(
    pts_world: jnp.ndarray,  # (V, S, 3) per-view per-token world points
    mix: float = 0.5,
    bbox_length: float = 8.0,
    plane_res: int = 32,
    unet_chunk_size: int = 2,
):
    """Attention processor: queries also attend to triplane-pooled features.

    ``pts_world`` must match the sequence length of the attention layer it is
    installed on (the reference only applies it at one resolution; same here —
    other layers fall back to plain attention automatically on a length
    mismatch).
    """
    norm_pts = jnp.clip(pts_world / bbox_length + 0.5, 0.0, 1.0 - 1e-6)  # (V, S, 3)

    def processor(q, k, v, is_cross: bool) -> jnp.ndarray:
        B, Hh, S, D = q.shape
        if is_cross or S != norm_pts.shape[1]:
            return _sdpa(q, k, v)
        V = norm_pts.shape[0]
        out_self = _sdpa(q, k, v)

        # build the three planes from all views' VALUES (flattened heads)
        feats = v.transpose(0, 2, 1, 3).reshape(B, S, Hh * D)
        reps = B // V  # CFG duplication
        pts = jnp.tile(norm_pts, (reps, 1, 1))  # (B, S, 3)
        flat_feats = feats.reshape(B * S, Hh * D)

        uvs = [
            pts[..., [0, 1]].reshape(B * S, 2),  # xy plane
            pts[..., [0, 2]].reshape(B * S, 2),  # xz
            pts[..., [1, 2]].reshape(B * S, 2),  # yz
        ]
        tri_feats = 0.0
        for uv in uvs:
            plane = scatter_mean_plane(flat_feats, uv, plane_res)
            tri_feats = tri_feats + sample_plane(plane, uv, plane_res)
        tri_feats = (tri_feats / 3.0).reshape(B, S, Hh, D).transpose(0, 2, 1, 3)

        # attend queries to the triplane features (keys = values = tri feats)
        out_tri = _sdpa(q, tri_feats, tri_feats)
        return mix * out_self + (1.0 - mix) * out_tri

    return processor
