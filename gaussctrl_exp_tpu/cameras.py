"""Camera model: intrinsics, pose → view/projection matrices, distortion params.

Replicates the reference's camera conventions (nerfstudio OpenGL camera-to-world
with the gsplat z/y axis flip, /root/reference/gaussctrl/gc_model.py:130-148):

  * ``c2w`` is 3×4 or 4×4 OpenGL-style (camera looks down −z, y up).
  * gsplat convention flips y/z: R ← R · diag(1, −1, −1); viewmat = [R|t]⁻¹.
  * projection matrix maps +z-forward view space with near 0.001 / far 1000
    (nerfstudio ``projection_matrix``: z ∈ …, w = +z).

Cameras are a JAX-friendly dataclass of arrays so a batch of cameras is just a
stacked pytree; all matrix construction is jnp and can run under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEAR_PLANE = 0.001
FAR_PLANE = 1000.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single camera (or a leading-batched stack of cameras)."""

    c2w: jnp.ndarray  # (..., 3, 4) camera-to-world, OpenGL convention
    fx: jnp.ndarray  # (...,)
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    width: int = dataclasses.field(metadata=dict(static=True), default=512)
    height: int = dataclasses.field(metadata=dict(static=True), default=512)

    @property
    def fovx(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan(self.width / (2.0 * self.fx))

    @property
    def fovy(self) -> jnp.ndarray:
        return 2.0 * jnp.arctan(self.height / (2.0 * self.fy))

    def __len__(self) -> int:
        return 1 if self.c2w.ndim == 2 else int(self.c2w.shape[0])

    def __getitem__(self, idx) -> "Camera":
        if self.c2w.ndim == 2:
            raise IndexError("cannot index a single camera")
        return Camera(
            c2w=self.c2w[idx],
            fx=self.fx[idx],
            fy=self.fy[idx],
            cx=self.cx[idx],
            cy=self.cy[idx],
            width=self.width,
            height=self.height,
        )


def projection_matrix(znear: float, zfar: float, fovx, fovy) -> jnp.ndarray:
    """nerfstudio splatfacto-style projection (w = +z), gc_model.py:147."""
    t = znear * jnp.tan(0.5 * fovy)
    r = znear * jnp.tan(0.5 * fovx)
    n, f = znear, zfar
    zero = jnp.zeros_like(jnp.asarray(fovx, jnp.float32))
    one = jnp.ones_like(zero)
    rows = [
        jnp.stack([n / r, zero, zero, zero], axis=-1),
        jnp.stack([zero, n / t, zero, zero], axis=-1),
        jnp.stack([zero, zero, (f + n) / (f - n) * one, -f * n / (f - n) * one], axis=-1),
        jnp.stack([zero, zero, one, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def projection_matrix_ogl(znear: float, zfar: float, fovx, fovy) -> jnp.ndarray:
    """OpenGL projection (−n→−1, −f→1), gc_model.py:39-57 (mat_proj output)."""
    t = znear * jnp.tan(0.5 * fovy)
    r = znear * jnp.tan(0.5 * fovx)
    n, f = znear, zfar
    zero = jnp.zeros_like(jnp.asarray(fovx, jnp.float32))
    one = jnp.ones_like(zero)
    rows = [
        jnp.stack([n / r, zero, zero, zero], axis=-1),
        jnp.stack([zero, n / t, zero, zero], axis=-1),
        jnp.stack([zero, zero, -(f + n) / (f - n) * one, -2.0 * f * n / (f - n) * one], axis=-1),
        jnp.stack([zero, zero, -one, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def view_matrix(c2w: jnp.ndarray, gsplat_flip: bool = True) -> jnp.ndarray:
    """(3|4, 4) camera-to-world → (4, 4) world→camera view matrix.

    With ``gsplat_flip`` the y/z axes are negated first (gc_model.py:130-138) so
    view space has +z forward, +y down — the convention the projection and EWA
    math expect.
    """
    R = c2w[:3, :3]
    t = c2w[:3, 3]
    if gsplat_flip:
        R = R * jnp.asarray([1.0, -1.0, -1.0])[None, :]
    R_inv = R.T
    t_inv = -R_inv @ t
    vm = jnp.eye(4, dtype=jnp.promote_types(R_inv.dtype, jnp.float32))
    vm = vm.at[:3, :3].set(R_inv)
    vm = vm.at[:3, 3].set(t_inv)
    return vm


def camera_matrices(cam: Camera) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (viewmat, projmat, fullmat=projmat@viewmat) for a single camera."""
    vm = view_matrix(cam.c2w)
    pm = projection_matrix(NEAR_PLANE, FAR_PLANE, cam.fovx, cam.fovy)
    return vm, pm, pm @ vm


def look_at(eye: np.ndarray, target: np.ndarray, up=(0.0, 0.0, 1.0)) -> np.ndarray:
    """Build an OpenGL c2w (3, 4) looking from ``eye`` at ``target`` (host-side helper)."""
    eye = np.asarray(eye, np.float32)
    target = np.asarray(target, np.float32)
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    up = np.asarray(up, np.float32)
    right = np.cross(forward, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)
    # OpenGL: camera looks down -z ⇒ z axis = -forward
    R = np.stack([right, true_up, -forward], axis=1)
    return np.concatenate([R, eye[:, None]], axis=1).astype(np.float32)


def make_camera(
    c2w: np.ndarray, fx: float, fy: float, cx: float, cy: float, width: int, height: int
) -> Camera:
    return Camera(
        c2w=jnp.asarray(c2w, jnp.float32).reshape(3, 4)
        if np.asarray(c2w).size == 12
        else jnp.asarray(c2w, jnp.float32)[:3, :4],
        fx=jnp.float32(fx),
        fy=jnp.float32(fy),
        cx=jnp.float32(cx),
        cy=jnp.float32(cy),
        width=int(width),
        height=int(height),
    )


def stack_cameras(cams: list) -> Camera:
    return Camera(
        c2w=jnp.stack([c.c2w for c in cams]),
        fx=jnp.stack([c.fx for c in cams]),
        fy=jnp.stack([c.fy for c in cams]),
        cx=jnp.stack([c.cx for c in cams]),
        cy=jnp.stack([c.cy for c in cams]),
        width=cams[0].width,
        height=cams[0].height,
    )
