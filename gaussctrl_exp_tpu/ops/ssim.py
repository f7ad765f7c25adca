"""SSIM in jnp (gaussian 11×11 window, the splatfacto training loss term).

The reference's loss is inherited from splatfacto:
``(1-λ)·L1 + λ·(1-SSIM)`` with λ=0.2 (selected by
/root/reference/gaussctrl/gc_model.py:59-70 via SplatfactoModelConfig).
Standard SSIM constants: k1=0.01, k2=0.03, data_range=1, σ=1.5, kernel 11;
mean over the valid (unpadded) region.

TPU note: tiny depthwise convolutions (3 channels, 11 taps) lower poorly —
measured ~2.8 ms fwd+bwd at 512². The separable gaussian filter is instead a
pair of BANDED MATMULS on the MXU (``Khᵀ · X · Kw``): ~25× more FLOPs, ~5×
less wall-clock, and all five SSIM statistics ride one batched contraction.
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


@functools.lru_cache(maxsize=16)
def _band_matrix(n: int, size: int, sigma: float) -> np.ndarray:
    """(n, n-size+1) banded matrix B with B[i, j] = kernel[i - j] — so
    ``X @ B`` is the valid-mode 1-D gaussian filter along that axis."""
    k = _gaussian_kernel_1d(size, sigma)
    m = n - size + 1
    band = np.zeros((n, m), np.float32)
    for t in range(size):
        band[np.arange(m) + t, np.arange(m)] = k[t]
    return band


def _filter_stack(stack: jnp.ndarray, size: int, sigma: float) -> jnp.ndarray:
    """(C, H, W) → (C, H', W') valid-mode separable gaussian filter as two
    MXU matmuls."""
    _, H, W = stack.shape
    pet = jnp.promote_types(stack.dtype, jnp.float32)  # f32, or f64 on x64 legs
    bh = jnp.asarray(_band_matrix(H, size, sigma), dtype=pet)  # (H, H')
    bw = jnp.asarray(_band_matrix(W, size, sigma), dtype=pet)  # (W, W')
    out = jnp.einsum("chw,wW->chW", stack, bw, preferred_element_type=pet)
    out = jnp.einsum("chW,hH->cHW", out, bh, preferred_element_type=pet)
    return out


def ssim_map(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Per-window SSIM map between (H, W, C) images → (H−k+1, W−k+1, C)."""
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    at = jnp.transpose(a, (2, 0, 1))  # (C, H, W)
    bt = jnp.transpose(b, (2, 0, 1))
    stats = jnp.concatenate([at, bt, at * at, bt * bt, at * bt], axis=0)  # (5C, H, W)
    f = _filter_stack(stats, kernel_size, sigma)
    C = a.shape[-1]
    mu_a, mu_b, mu_aa, mu_bb, mu_ab = (
        jnp.transpose(f[i * C : (i + 1) * C], (1, 2, 0)) for i in range(5)
    )

    var_a = mu_aa - mu_a * mu_a
    var_b = mu_bb - mu_b * mu_b
    cov = mu_ab - mu_a * mu_b

    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)
    return num / den


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
    return jnp.mean(ssim_map(a, b, data_range, kernel_size, sigma, k1, k2))


def l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(a - b))


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio (the reference's eval metric, inherited from
    splatfacto's image metrics, gc_trainer.py:226-227)."""
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def splatfacto_loss(
    pred: jnp.ndarray, gt: jnp.ndarray, ssim_lambda: float = 0.2
) -> tuple[jnp.ndarray, dict]:
    """(1−λ)·L1 + λ·(1−SSIM) — the splatfacto main loss the reference trains with."""
    l1_val = l1(pred, gt)
    ssim_val = ssim(pred, gt)
    loss = (1.0 - ssim_lambda) * l1_val + ssim_lambda * (1.0 - ssim_val)
    return loss, {"l1": l1_val, "ssim": ssim_val, "main_loss": loss, "psnr": psnr(pred, gt)}
