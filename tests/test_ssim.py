"""SSIM loss properties."""

import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.ops.ssim import l1, splatfacto_loss, ssim


def test_ssim_identical_images():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32))
    assert float(ssim(img, img)) > 0.9999


def test_ssim_range_and_monotonicity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (48, 48, 3)).astype(np.float32))
    small = img + 0.02 * jnp.asarray(rng.normal(size=(48, 48, 3)).astype(np.float32))
    big = img + 0.3 * jnp.asarray(rng.normal(size=(48, 48, 3)).astype(np.float32))
    s_small, s_big = float(ssim(img, small)), float(ssim(img, big))
    assert 1.0 >= s_small > s_big


def test_ssim_invariant_to_constant_scale_luminance():
    """Known SSIM identity: structural term near 1 for a small mean shift."""
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (48, 48, 1)).astype(np.float32))
    shifted = img + 0.001
    assert float(ssim(img, shifted)) > 0.999


def test_ssim_uncorrelated_noise_low():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    assert float(ssim(a, b)) < 0.2


def test_splatfacto_loss_composition():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    loss, m = splatfacto_loss(a, b, ssim_lambda=0.2)
    np.testing.assert_allclose(
        float(loss), 0.8 * float(m["l1"]) + 0.2 * (1 - float(m["ssim"])), rtol=1e-6
    )
    zero, m0 = splatfacto_loss(a, a)
    assert float(zero) < 1e-5
