"""Unit tests for quat/SH/projection ops against analytic expectations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops.projection import project_gaussians
from gaussctrl_exp_tpu.ops.quat import quat_to_rotmat, scale_rot_to_cov3d
from gaussctrl_exp_tpu.ops.sh import SH_C0, eval_sh, num_sh_bases, sh_basis


def test_quat_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    R = quat_to_rotmat(q)
    np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)


def test_quat_rotation_properties(rng):
    q = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    R = np.asarray(quat_to_rotmat(q))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), np.ones(32), atol=1e-5)


def test_quat_90deg_z():
    # 90° about z: w = cos(45°), z = sin(45°)
    s = np.sin(np.pi / 4)
    q = jnp.array([[np.cos(np.pi / 4), 0.0, 0.0, s]])
    R = np.asarray(quat_to_rotmat(q))[0]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), atol=1e-6)


def test_cov3d_isotropic():
    q = jnp.array([[1.0, 0, 0, 0]])
    s = jnp.array([[0.5, 0.5, 0.5]])
    cov = np.asarray(scale_rot_to_cov3d(s, q))[0]
    np.testing.assert_allclose(cov, 0.25 * np.eye(3), atol=1e-6)


def test_cov3d_rotation_invariant_trace(rng):
    q = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    s = jnp.asarray(rng.uniform(0.1, 1.0, size=(8, 3)).astype(np.float32))
    cov = np.asarray(scale_rot_to_cov3d(s, q))
    np.testing.assert_allclose(np.trace(cov, axis1=1, axis2=2), np.sum(np.asarray(s) ** 2, -1), rtol=1e-5)


def test_sh_degree0_constant():
    dirs = jnp.asarray(np.random.default_rng(1).normal(size=(16, 3)))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = jnp.ones((16, 1, 3))
    out = eval_sh(0, dirs, coeffs)
    np.testing.assert_allclose(out, SH_C0 * np.ones((16, 3)), atol=1e-6)


def test_sh_bases_count():
    assert num_sh_bases(0) == 1
    assert num_sh_bases(3) == 16
    assert num_sh_bases(4) == 25
    dirs = jnp.array([[0.0, 0.0, 1.0]])
    assert sh_basis(4, dirs).shape == (1, 25)


def test_sh_degree_masking(rng):
    """active_degree masks higher-order bases exactly."""
    dirs = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    coeffs = jnp.asarray(rng.normal(size=(8, 16, 3)).astype(np.float32))
    out1 = eval_sh(1, dirs, coeffs)
    coeffs_trunc = coeffs.at[:, 4:, :].set(0.0)
    out_full = eval_sh(3, dirs, coeffs_trunc)
    np.testing.assert_allclose(out1, out_full, atol=1e-6)


def test_sh_orthonormality():
    """Monte-Carlo: SH bases are orthonormal over the sphere (loose check)."""
    rng = np.random.default_rng(2)
    dirs = rng.normal(size=(200000, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    B = np.asarray(sh_basis(2, jnp.asarray(dirs)))  # (M, 9)
    gram = (B.T @ B) / B.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(9), atol=0.15)


@pytest.fixture
def cam():
    c2w = look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3))
    return make_camera(c2w, fx=100.0, fy=100.0, cx=32.0, cy=32.0, width=64, height=64)


def _project(cam, means, scales=None, quats=None):
    n = means.shape[0]
    scales = scales if scales is not None else jnp.full((n, 3), 0.05)
    quats = quats if quats is not None else jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1))
    vm, pm, fm = camera_matrices(cam)
    return project_gaussians(
        means, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, cam.height, cam.width
    )


def test_projection_center(cam):
    """A gaussian at the look-at target lands at the principal point − 0.5."""
    proj = _project(cam, jnp.zeros((1, 3)))
    assert bool(proj.mask[0])
    np.testing.assert_allclose(proj.xys[0], [32.0 - 0.5, 32.0 - 0.5], atol=1e-3)
    np.testing.assert_allclose(proj.depths[0], 4.0, atol=1e-5)


def test_projection_pinhole_offset(cam):
    """Off-axis point follows the pinhole model fx·x/z + cx − 0.5."""
    # camera at (0,-4,0) looking +y; world x maps to image -x? Verify via formula.
    means = jnp.array([[0.4, 0.0, 0.3]])
    proj = _project(cam, means)
    vm, _, _ = camera_matrices(cam)
    p_view = np.asarray(vm[:3, :3] @ means[0] + vm[:3, 3])
    expect_x = 100.0 * p_view[0] / p_view[2] + 32.0 - 0.5
    expect_y = 100.0 * p_view[1] / p_view[2] + 32.0 - 0.5
    np.testing.assert_allclose(proj.xys[0], [expect_x, expect_y], atol=1e-3)


def test_projection_culls_behind(cam):
    means = jnp.array([[0.0, -10.0, 0.0], [0.0, 0.0, 0.0]])  # first is behind camera
    proj = _project(cam, means)
    assert not bool(proj.mask[0])
    assert bool(proj.mask[1])
    assert int(proj.radii[0]) == 0
    assert int(proj.num_tiles_hit[0]) == 0


def test_projection_isotropic_radius(cam):
    """Isotropic gaussian: cov2d ≈ (f·s/z)²·I + 0.3, radius = ceil(3σ)."""
    s = 0.1
    proj = _project(cam, jnp.zeros((1, 3)), scales=jnp.full((1, 3), s))
    var = (100.0 * s / 4.0) ** 2 + 0.3
    expected_radius = np.ceil(3 * np.sqrt(var))
    assert int(proj.radii[0]) == int(expected_radius)
    # conic is inverse covariance
    np.testing.assert_allclose(proj.conics[0, 0], 1.0 / var, rtol=1e-4)
    np.testing.assert_allclose(proj.conics[0, 1], 0.0, atol=1e-5)


def test_projection_tile_bbox(cam):
    proj = _project(cam, jnp.zeros((1, 3)))
    tx0, ty0, tx1, ty1 = np.asarray(proj.tile_bbox[0])
    r = int(proj.radii[0])
    cx_pix, cy_pix = np.asarray(proj.xys[0])
    assert tx0 <= int(cx_pix) // 16 < tx1
    assert ty0 <= int(cy_pix) // 16 < ty1
    assert int(proj.num_tiles_hit[0]) == (tx1 - tx0) * (ty1 - ty0)
