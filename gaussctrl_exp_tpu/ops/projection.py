"""3D→2D EWA Gaussian projection (frustum cull, covariance splat, tile extent).

TPU-native re-design of the behavior of gsplat v0.1.2's ``project_gaussians``
CUDA kernel as invoked by the reference (/root/reference/gaussctrl/gc_model.py:174-188):

  * world→camera transform with near-plane clip (``clip_thresh``),
  * Σ3D = (R S)(R S)ᵀ from quats/scales,
  * EWA: cov2d = J W Σ Wᵀ Jᵀ with FOV-clamped Jacobian, +0.3 px low-pass on the
    diagonal,
  * conic (inverse cov2d), 3σ radius from the max eigenvalue,
  * pixel-space center via the full projection matrix and
    ``ndc2pix(x, S, c) = 0.5·S·x + c − 0.5``,
  * 16×16 tile bbox + per-Gaussian tile-hit count.

Unlike the CUDA original (a kernel with a hand-written backward), this is pure
vectorized jnp over the dense (N, …) Gaussian arrays: on TPU the whole
projection fuses into a handful of VPU loops and is differentiable for free
through ``jax.grad`` — the hot, irregular part of the pipeline (binning +
blending) lives in ops/binning.py and ops/blend*.py instead.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .quat import quat_to_rotmat

BLOCK = 16  # rasterizer tile size, matches gc_model.py:150


class ProjectedGaussians(NamedTuple):
    """Dense per-Gaussian projection results (all shapes static in N)."""

    xys: jnp.ndarray  # (N, 2) pixel-space centers
    depths: jnp.ndarray  # (N,) camera-space z
    radii: jnp.ndarray  # (N,) int32 pixel radius (0 = culled)
    conics: jnp.ndarray  # (N, 3) inverse 2D covariance (upper triangle)
    num_tiles_hit: jnp.ndarray  # (N,) int32
    cov3d: jnp.ndarray  # (N, 3, 3)
    mask: jnp.ndarray  # (N,) bool visibility
    tile_bbox: jnp.ndarray  # (N, 4) int32 [tx0, ty0, tx1, ty1)


def project_gaussians(
    means: jnp.ndarray,
    scales: jnp.ndarray,
    glob_scale: float,
    quats: jnp.ndarray,
    viewmat: jnp.ndarray,
    fullmat: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    img_height: int,
    img_width: int,
    clip_thresh: float = 0.01,
    extra_mask: jnp.ndarray | None = None,
    opacities: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project N Gaussians to screen space.

    Args:
      means: (N, 3) world positions.
      scales: (N, 3) — already exponentiated (the model passes exp(log_scales)).
      quats: (N, 4) wxyz, normalized or not.
      viewmat: (4, 4) world→camera.
      fullmat: (4, 4) projmat @ viewmat.
      extra_mask: optional (N,) bool to pre-cull (alive mask / crop box).
      opacities: optional (N,) post-sigmoid opacities. When given, the tile
        bbox is tightened to the axis-aligned extent of the level set
        ``α ≥ 1/255`` — the exact region the blend kernel composites
        (``alpha >= MIN_ALPHA`` mask) — intersected with gsplat's 3σ square
        box. Every dropped (gaussian, tile) pair contributes *nothing* in
        both this framework and gsplat v0.1.2 (whose rasterizer `continue`s
        at α < 1/255), so rgb/depth/gradients are unchanged while
        intersection counts (and the static capacity they force) shrink
        substantially. ``radii`` stays the gsplat eigenvalue radius.
    """
    # dtype-following: f32 normally; f64 inputs (CPU parity legs under
    # jax_enable_x64, e.g. dryrun_multichip's tightened-grad-bound check)
    # keep f64 so reduction-order noise collapses below the parity tolerance
    f32 = jnp.promote_types(means.dtype, jnp.float32)
    means = means.astype(f32)
    Rv = viewmat[:3, :3].astype(f32)
    tv = viewmat[:3, 3].astype(f32)

    p_view = means @ Rv.T + tv  # (N, 3)
    tz = p_view[:, 2]
    in_front = tz > clip_thresh

    # --- 3D covariance Σ = (R·S)(R·S)ᵀ, all explicit component algebra:
    # XLA lowers batched tiny matmuls poorly (measured ~1.4 ms for N=35k);
    # written out as (N,) vector ops the whole projection is pure VPU work.
    q = quats.astype(f32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qw * qz)
    r02 = 2 * (qx * qz + qw * qy)
    r10 = 2 * (qx * qy + qw * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qw * qx)
    r20 = 2 * (qx * qz - qw * qy)
    r21 = 2 * (qy * qz + qw * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)
    s = scales.astype(f32) * glob_scale
    s0sq, s1sq, s2sq = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2
    # Σ = R diag(s²) Rᵀ (upper triangle)
    c00 = r00 * r00 * s0sq + r01 * r01 * s1sq + r02 * r02 * s2sq
    c01 = r00 * r10 * s0sq + r01 * r11 * s1sq + r02 * r12 * s2sq
    c02 = r00 * r20 * s0sq + r01 * r21 * s1sq + r02 * r22 * s2sq
    c11 = r10 * r10 * s0sq + r11 * r11 * s1sq + r12 * r12 * s2sq
    c12 = r10 * r20 * s0sq + r11 * r21 * s1sq + r12 * r22 * s2sq
    c22 = r20 * r20 * s0sq + r21 * r21 * s1sq + r22 * r22 * s2sq
    cov3d = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c01, c11, c12], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        axis=-2,
    )

    # --- EWA 2D covariance with FOV-limited Jacobian
    tan_fovx = 0.5 * img_width / fx
    tan_fovy = 0.5 * img_height / fy
    lim_x = 1.3 * tan_fovx
    lim_y = 1.3 * tan_fovy
    tz_safe = jnp.where(in_front, tz, 1.0)
    tx = jnp.clip(p_view[:, 0] / tz_safe, -lim_x, lim_x) * tz_safe
    ty = jnp.clip(p_view[:, 1] / tz_safe, -lim_y, lim_y) * tz_safe
    rz = 1.0 / tz_safe
    rz2 = rz * rz
    # J rows: (fx·rz, 0, −fx·tx·rz²), (0, fy·rz, −fy·ty·rz²); T = J @ Rv
    j02 = -fx * tx * rz2
    j12 = -fy * ty * rz2
    Rv00, Rv01, Rv02 = Rv[0, 0], Rv[0, 1], Rv[0, 2]
    Rv10, Rv11, Rv12 = Rv[1, 0], Rv[1, 1], Rv[1, 2]
    Rv20, Rv21, Rv22 = Rv[2, 0], Rv[2, 1], Rv[2, 2]
    t00 = fx * rz * Rv00 + j02 * Rv20
    t01 = fx * rz * Rv01 + j02 * Rv21
    t02 = fx * rz * Rv02 + j02 * Rv22
    t10 = fy * rz * Rv10 + j12 * Rv20
    t11 = fy * rz * Rv11 + j12 * Rv21
    t12 = fy * rz * Rv12 + j12 * Rv22
    # cov2d = T Σ Tᵀ (2×2 symmetric, expanded)
    w00 = t00 * c00 + t01 * c01 + t02 * c02
    w01 = t00 * c01 + t01 * c11 + t02 * c12
    w02 = t00 * c02 + t01 * c12 + t02 * c22
    w10 = t10 * c00 + t11 * c01 + t12 * c02
    w11 = t10 * c01 + t11 * c11 + t12 * c12
    w12 = t10 * c02 + t11 * c12 + t12 * c22
    # low-pass: splat is at least ~1px wide (gsplat adds 0.3 to the diagonal)
    a = w00 * t00 + w01 * t01 + w02 * t02 + 0.3
    b_ = w00 * t10 + w01 * t11 + w02 * t12
    c = w10 * t10 + w11 * t11 + w12 * t12 + 0.3

    det = a * c - b_ * b_
    det_valid = det != 0.0
    det_safe = jnp.where(det_valid, det, 1.0)
    conics = jnp.stack([c / det_safe, -b_ / det_safe, a / det_safe], axis=-1)

    half_tr = 0.5 * (a + c)
    v1 = half_tr + jnp.sqrt(jnp.maximum(0.1, half_tr * half_tr - det))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(v1, 0.0)))

    # --- center via full projection matrix
    p_hom = means @ fullmat[:3, :3].T + fullmat[:3, 3]
    w_hom = means @ fullmat[3, :3].T + fullmat[3, 3]
    rw = 1.0 / (w_hom + 1e-6)
    px_ndc = p_hom[:, 0] * rw
    py_ndc = p_hom[:, 1] * rw
    xys = jnp.stack(
        [
            0.5 * img_width * px_ndc + cx - 0.5,
            0.5 * img_height * py_ndc + cy - 0.5,
        ],
        axis=-1,
    )

    # --- tile bbox (truncation toward zero like the CUDA int cast, then clamp)
    tiles_x = (img_width + BLOCK - 1) // BLOCK
    tiles_y = (img_height + BLOCK - 1) // BLOCK
    if opacities is not None:
        # α(d) = min(0.999, op·e^{−σ(d)}) with σ = ½ dᵀ cov2d⁻¹ d; the blend
        # kernels skip α < 1/255, so only the level set σ ≤ ln(255·op) can
        # contribute. Its axis-aligned half-extents are √(2σ·cov2d_ii).
        s_lvl = jnp.log(jnp.maximum(255.0 * opacities.reshape(-1), 1e-12)) + 1e-6
        s_pos = jnp.maximum(s_lvl, 0.0)
        hx = jnp.minimum(jnp.sqrt(2.0 * s_pos * jnp.maximum(a, 0.0)), radius_f)
        hy = jnp.minimum(jnp.sqrt(2.0 * s_pos * jnp.maximum(c, 0.0)), radius_f)
        opac_visible = s_lvl > 0.0  # op ≤ 1/255 ⇒ α < 1/255 everywhere ⇒ cull
    else:
        hx = hy = radius_f
        opac_visible = True
    tile_cx = xys[:, 0] / BLOCK
    tile_cy = xys[:, 1] / BLOCK
    tx0 = jnp.clip((tile_cx - hx / BLOCK).astype(jnp.int32), 0, tiles_x)
    tx1 = jnp.clip((tile_cx + hx / BLOCK + 1.0).astype(jnp.int32), 0, tiles_x)
    ty0 = jnp.clip((tile_cy - hy / BLOCK).astype(jnp.int32), 0, tiles_y)
    ty1 = jnp.clip((tile_cy + hy / BLOCK + 1.0).astype(jnp.int32), 0, tiles_y)
    area = (tx1 - tx0) * (ty1 - ty0) * opac_visible

    mask = in_front & det_valid & (area > 0)
    if extra_mask is not None:
        mask = mask & extra_mask

    radii = jnp.where(mask, radius_f, 0.0).astype(jnp.int32)
    num_tiles_hit = jnp.where(mask, area, 0).astype(jnp.int32)
    tile_bbox = jnp.stack([tx0, ty0, tx1, ty1], axis=-1).astype(jnp.int32)
    # zero the bbox of culled gaussians so downstream expansion sees area 0
    tile_bbox = jnp.where(mask[:, None], tile_bbox, 0)

    return ProjectedGaussians(
        xys=xys,
        depths=tz,
        radii=radii,
        conics=conics,
        num_tiles_hit=num_tiles_hit,
        cov3d=cov3d,
        mask=mask,
        tile_bbox=tile_bbox,
    )
