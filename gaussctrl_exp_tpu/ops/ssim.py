"""SSIM in jnp (gaussian 11×11 window, the splatfacto training loss term).

The reference's loss is inherited from splatfacto:
``(1-λ)·L1 + λ·(1-SSIM)`` with λ=0.2 (selected by
/root/reference/gaussctrl/gc_model.py:59-70 via SplatfactoModelConfig).
Standard SSIM constants: k1=0.01, k2=0.03, data_range=1, σ=1.5, kernel 11;
mean over the valid (unpadded) region. Depthwise convolutions — XLA maps these
onto the MXU/VPU efficiently and it is fully differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_kernel_1d(size: int, sigma: float) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


def _filter2d(img: jnp.ndarray, kernel1d: np.ndarray) -> jnp.ndarray:
    """(H, W, C) valid-mode depthwise gaussian filter — separable (two 1D
    passes: 2·k taps instead of k², ~5× less VPU work at k=11)."""
    C = img.shape[-1]
    k = jnp.asarray(kernel1d)
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, C))  # (k, 1, 1, C)
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, C))
    out = jax.lax.conv_general_dilated(
        img[None], kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
    )
    return out[0]


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM between (H, W, C) images."""
    kernel = _gaussian_kernel_1d(kernel_size, sigma)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_a = _filter2d(a, kernel)
    mu_b = _filter2d(b, kernel)
    mu_aa = _filter2d(a * a, kernel)
    mu_bb = _filter2d(b * b, kernel)
    mu_ab = _filter2d(a * b, kernel)

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b

    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def splatfacto_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, ssim_lambda: float = 0.2
) -> tuple[jnp.ndarray, dict]:
    """(1−λ)·L1 + λ·(1−SSIM) — the splatfacto main loss the reference trains with."""
    l1_val = l1(pred, gt)
    ssim_val = ssim(pred, gt)
    loss = (1.0 - ssim_lambda) * l1_val + ssim_lambda * (1.0 - ssim_val)
    return loss, {"l1": l1_val, "ssim": ssim_val, "main_loss": loss}
