"""Camera pose optimization (the reference's ``camera_opt`` parameter group).

The reference trains a 7th Adam group "camera_opt" (lr 1e-3 → 5e-5, with
gradient accumulation 100, /root/reference/gaussctrl/gc_config.py:50,84-87) —
nerfstudio's SO3xR3 pose adjustment. Here: per-view 6-vector tangent deltas
``(ω, t)`` applied to the camera-to-world pose by first-order SO3 exp-map +
translation, differentiable through the renderer.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..cameras import Camera


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) axis-angle → (…, 3, 3) rotation.

    Rodrigues without axis normalization — R = I + sinc(θ)·Ω + c2(θ)·Ω² with
    Ω = skew(ω) — so the gradient is finite at ω = 0 (norm() has a NaN
    gradient at zero; both branches below are evaluated on safe inputs).
    """
    ox, oy, oz = omega[..., 0], omega[..., 1], omega[..., 2]
    zero = jnp.zeros_like(ox)
    Om = jnp.stack(
        [
            jnp.stack([zero, -oz, oy], -1),
            jnp.stack([oz, zero, -ox], -1),
            jnp.stack([-oy, ox, zero], -1),
        ],
        axis=-2,
    )
    th2 = jnp.sum(omega * omega, axis=-1)
    small = th2 < 1e-8
    th2_safe = jnp.where(small, 1.0, th2)
    th = jnp.sqrt(th2_safe)
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)  # sinc
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2_safe)
    eye = jnp.broadcast_to(jnp.eye(3), Om.shape)
    return eye + a[..., None, None] * Om + b[..., None, None] * (Om @ Om)


def apply_pose_delta(camera: Camera, delta6: jnp.ndarray) -> Camera:
    """Adjust a camera's pose by a tangent-space delta (ω[3], t[3])."""
    R_adj = exp_so3(delta6[:3])
    R = R_adj @ camera.c2w[:3, :3]
    t = camera.c2w[:3, 3] + delta6[3:]
    c2w = jnp.concatenate([R, t[:, None]], axis=1)
    return Camera(
        c2w=c2w, fx=camera.fx, fy=camera.fy, cx=camera.cx, cy=camera.cy,
        width=camera.width, height=camera.height,
    )
