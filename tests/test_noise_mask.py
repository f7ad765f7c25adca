"""Experimental 3D noise mask (ad_render/ad_noise parity, TPU rebuild)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaussctrl_exp_tpu.cameras import look_at, make_camera
from gaussctrl_exp_tpu.experimental.noise_mask import (
    NoiseMaskConfig,
    noise_points,
    perlin_noise_3d,
    render_noise_mask,
)
from gaussctrl_exp_tpu.ops.renderer import RenderConfig


def test_perlin_deterministic_and_normalized():
    a = perlin_noise_3d((12, 12, 12), scale=0.3, seed=7)
    b = perlin_noise_3d((12, 12, 12), scale=0.3, seed=7)
    c = perlin_noise_3d((12, 12, 12), scale=0.3, seed=8)
    assert np.allclose(a, b)
    assert not np.allclose(a, c)
    assert a.min() == 0.0 and a.max() == 1.0
    # gradient noise, not constant: decent spread
    assert a.std() > 0.05


def test_perlin_octaves_add_detail():
    lo = perlin_noise_3d((16, 16, 16), scale=0.2, octaves=1, seed=3, normalize=False)
    hi = perlin_noise_3d((16, 16, 16), scale=0.2, octaves=3, persistence=0.5, seed=3,
                         normalize=False)
    # higher octaves change the field (adds higher-frequency energy)
    assert not np.allclose(lo, hi)


def test_noise_points_inside_cube():
    cfg = NoiseMaskConfig(resolution=20, noise_threshold=0.7)
    pts = noise_points(cfg)
    assert pts.ndim == 2 and pts.shape[1] == 3
    assert pts.shape[0] > 0  # threshold 0.7 keeps some of a normalized field
    assert np.all(np.abs(pts) <= cfg.cube_size / 2 + 1e-6)


@pytest.mark.slow
def test_render_noise_mask_depth_visibility():
    """Points at the scene surface paint the mask; points far behind/in front
    do not (|d_point − d_scene| < window, ad_render.py frag shader test)."""
    H = W = 32
    cam = make_camera(look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
                      fx=W * 1.2, fy=W * 1.2, cx=W / 2, cy=H / 2, width=W, height=H)
    # two hand-placed "noise points": one on the synthetic surface (depth 4.0
    # at the image center), one 1 unit behind it
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 1.0, 0.0]], np.float32)
    scene_depth = jnp.full((H, W), 4.0, jnp.float32)
    cfg = NoiseMaskConfig(noise_unit_size=0.05, frag_depth_threshold=0.05)
    rc = RenderConfig(impl="jnp", isect_capacity=1 << 10, render_depth=False,
                      max_per_tile=16)
    mask = render_noise_mask(pts, scene_depth, cam, cfg, rc)
    assert mask.shape == (H, W)
    m = np.asarray(mask)
    assert m[H // 2, W // 2] > 0.5  # on-surface point visible at center
    # the occluded point alone would paint nothing: shift surface away
    mask2 = render_noise_mask(pts, jnp.full((H, W), 2.0, jnp.float32), cam, cfg, rc)
    assert float(np.asarray(mask2).max()) == 0.0


def test_render_noise_mask_multiview_consistency():
    """The same 3D points project consistently: rotating the camera keeps the
    mask anchored (non-empty from nearby viewpoints) — the property the
    reference built the whole OpenGL pipeline for."""
    H = W = 32
    cfg = NoiseMaskConfig(resolution=16, noise_threshold=0.75,
                          noise_unit_size=0.08, frag_depth_threshold=10.0)
    pts = noise_points(cfg)
    rc = RenderConfig(impl="jnp", isect_capacity=1 << 12, render_depth=False,
                      max_per_tile=64)
    covs = []
    for ang in (0.0, 0.3):
        eye = np.array([4.0 * np.sin(ang), -4.0 * np.cos(ang), 0.5])
        cam = make_camera(look_at(eye, np.zeros(3)), W * 1.2, W * 1.2,
                          W / 2, H / 2, W, H)
        scene_depth = jnp.full((H, W), 4.0, jnp.float32)  # window 10 → all pass
        mask = np.asarray(render_noise_mask(pts, scene_depth, cam, cfg, rc))
        covs.append((mask > 0.5).mean())
    assert covs[0] > 0.01 and covs[1] > 0.01
