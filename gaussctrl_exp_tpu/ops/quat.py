"""Quaternion → rotation and 3D covariance construction.

Replicates the math used by the reference's rasterizer dependency
(gsplat v0.1.2 ``scale_rot_to_cov3d`` / ``quat_to_rotmat``, called from
/root/reference/gaussctrl/gc_model.py:174-188): quaternions are (w, x, y, z),
Σ = (R S)(R S)ᵀ with S = diag(scale) · glob_scale.

Everything here is plain jnp and therefore trivially differentiable; XLA fuses
these elementwise ops into the surrounding projection computation.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), eps)


def quat_to_rotmat(quats: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternions (not necessarily normalized) → (..., 3, 3) rotations."""
    q = normalize(quats)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def scale_rot_to_cov3d(
    scales: jnp.ndarray, quats: jnp.ndarray, glob_scale: float = 1.0
) -> jnp.ndarray:
    """(N, 3) scales (already exponentiated), (N, 4) wxyz quats → (N, 3, 3) Σ.

    Σ = M Mᵀ with M = R · diag(scale · glob_scale).
    """
    R = quat_to_rotmat(quats)
    M = R * (scales * glob_scale)[..., None, :]
    return M @ jnp.swapaxes(M, -1, -2)
