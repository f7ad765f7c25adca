"""Depth ↔ world geometry for the multi-view attention experiments.

jnp equivalents of the reference's experimental helpers:
  * ``depth_to_world_points`` ≈ gc_pipeline.depth_map_screen_to_world
    (/root/reference/gaussctrl/gc_pipeline.py:286-314 + compute_ray_directions
    :503-536) — unproject a depth map through the pinhole camera to world
    points (the reference hard-codes fov_y=0.888 rad; here real intrinsics).
  * ``project_points`` ≈ mv_depth_utils reprojection (mv_depth_utils.py:178-213)
    — world points into another view's pixel coordinates + depths.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cameras import Camera


def depth_to_world_points(depth: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """(H, W) depth (camera z, OpenGL-style camera looking down −z) → (H, W, 3)
    world points."""
    H, W = depth.shape
    xs = jnp.arange(W, dtype=jnp.float32) + 0.5
    ys = jnp.arange(H, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys)
    # camera-space ray directions (OpenGL: x right, y up, looking down -z)
    dx = (px - camera.cx) / camera.fx
    dy = -(py - camera.cy) / camera.fy
    dirs_cam = jnp.stack([dx, dy, -jnp.ones_like(dx)], axis=-1)
    pts_cam = dirs_cam * depth[..., None]
    R = camera.c2w[:3, :3]
    t = camera.c2w[:3, 3]
    return pts_cam @ R.T + t


def project_points(pts_world: jnp.ndarray, camera: Camera):
    """(..., 3) world points → ((..., 2) pixel xy, (...,) camera depth).

    Depth is the positive distance along the viewing direction; points behind
    the camera get negative depth.
    """
    R = camera.c2w[:3, :3]
    t = camera.c2w[:3, 3]
    pts_cam = (pts_world - t) @ R  # R^T applied from the right
    z = -pts_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    u = camera.fx * (pts_cam[..., 0] / z_safe) + camera.cx
    v = -camera.fy * (pts_cam[..., 1] / z_safe) + camera.cy
    return jnp.stack([u - 0.5, v - 0.5], axis=-1), z


def bilinear_sample(grid: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """grid (H, W, C), xy (..., 2) in pixel coords → (..., C) bilinear samples
    (zero padding outside)."""
    H, W, C = grid.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0

    def tap(xi, yi, w):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        return grid[yi, xi] * (w * inside)[..., None]

    return (
        tap(x0, y0, (1 - fx) * (1 - fy))
        + tap(x0 + 1, y0, fx * (1 - fy))
        + tap(x0, y0 + 1, (1 - fx) * fy)
        + tap(x0 + 1, y0 + 1, fx * fy)
    )
