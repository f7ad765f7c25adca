"""Text-driven inpainting — the capability behind the reference's inpaint
experiments (my_inpaint_test.py:17-78 drives ControlNet-inpaint / SDXL-inpaint
pipelines on data/chair_test; my_multi_edit.py:176-369 is a stale multi-view
variant; none registered as methods, SURVEY.md §2.2).

TPU-native design: instead of requiring a 9-channel inpaint UNet checkpoint
(the diffusers pipelines' conv_in surgery), masked regeneration is done by
**latent blending**: at every DDIM step the region outside the mask is
re-anchored to the properly-noised original latent

    x_t ← m ⊙ x_t  +  (1 − m) ⊙ add_noise(x_orig, t)

so any SD1.x checkpoint (including the ControlNet-conditioned stack already in
sd_pipeline.py) inpaints without weight surgery. With a ControlNet depth hint
this mirrors the reference's controlnet-inpaint experiment; without, its plain
SD-inpaint one. The denoise loop stays one ``lax.scan``.

Masks follow the edit pipeline's convention (1 = edit region, matching the
SAM/`mask_npy/` sidecars): float (H, W) downsampled to the 64² latent grid.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .sd_pipeline import SDControlNetPipeline


@dataclasses.dataclass(frozen=True)
class InpaintConfig:
    guidance_scale: float = 7.5
    num_steps: int = 20
    cond_scale: float = 1.0  # ControlNet strength (0 disables the hint path)
    mask_blur: int = 0  # latent-grid blur taps for soft seams


def mask_to_latent(mask: np.ndarray, latent_hw: int, blur: int = 0) -> jnp.ndarray:
    """(H, W) {0,1} edit mask → (latent_hw, latent_hw, 1) float latent mask."""
    m = jnp.asarray(np.asarray(mask, np.float32).reshape(mask.shape[0], mask.shape[1]))
    m = jax.image.resize(m, (latent_hw, latent_hw), "bilinear")
    for _ in range(blur):
        m = (
            m
            + jnp.roll(m, 1, 0) + jnp.roll(m, -1, 0)
            + jnp.roll(m, 1, 1) + jnp.roll(m, -1, 1)
        ) / 5.0
    return jnp.clip(m, 0.0, 1.0)[..., None]


class SDInpaintPipeline:
    """Masked regeneration on top of the SD(+ControlNet) stack."""

    def __init__(self, pipe: SDControlNetPipeline, cfg: InpaintConfig = InpaintConfig()):
        self.pipe = pipe
        self.cfg = cfg

    def inpaint_latents(
        self,
        key: jax.Array,
        orig_latents: jnp.ndarray,  # (B, h, w, 4) VAE-encoded originals
        mask_lat: jnp.ndarray,  # (h, w, 1) or (B, h, w, 1); 1 = regenerate
        ctx_cond: jnp.ndarray,
        ctx_uncond: jnp.ndarray,
        hint: Optional[jnp.ndarray] = None,  # (B, H, W, 3) ControlNet hint
        init_latents: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """DDIM sampling with per-step out-of-mask re-anchoring."""
        cfg = self.cfg
        p = self.pipe
        B = orig_latents.shape[0]
        if mask_lat.ndim == 3:
            mask_lat = jnp.broadcast_to(mask_lat[None], orig_latents.shape[:3] + (1,))
        ts = p.scheduler.set_timesteps(cfg.num_steps)
        noise_key, lat_key = jax.random.split(key)
        noise = jax.random.normal(noise_key, orig_latents.shape, orig_latents.dtype)
        lat = (
            init_latents
            if init_latents is not None
            else p.scheduler.add_noise(orig_latents, jax.random.normal(lat_key, orig_latents.shape), int(ts[0]))
        )
        if hint is None:
            h = w = orig_latents.shape[1] * 8
            hint = jnp.zeros((B, h, w, 3), orig_latents.dtype)
            cond_scale = 0.0
        else:
            cond_scale = cfg.cond_scale
        ctx2 = jnp.concatenate([ctx_uncond, ctx_cond], axis=0)
        hint2 = jnp.concatenate([hint, hint], axis=0)
        step = p.scheduler.cfg.num_train_timesteps // cfg.num_steps

        def body(carry, t):
            x = carry
            x2 = jnp.concatenate([x, x], axis=0)
            eps2 = p._eps(x2, jnp.full((2 * B,), t), ctx2, hint2, cond_scale)
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
            x = p.scheduler.step(eps, t, x)
            # re-anchor the keep region at the NEXT step's noise level
            t_prev = jnp.maximum(t - step, 0)
            anchored = p.scheduler.add_noise(orig_latents, noise, t_prev)
            anchored = jnp.where(t - step >= 0, anchored, orig_latents)
            return mask_lat * x + (1.0 - mask_lat) * anchored, None

        lat, _ = jax.lax.scan(body, lat, jnp.asarray(ts))
        return lat

    def inpaint_images(
        self,
        key: jax.Array,
        images: jnp.ndarray,  # (B, H, W, 3) in [0, 1]
        mask: np.ndarray,  # (H, W) 1 = regenerate
        ctx_cond: jnp.ndarray,
        ctx_uncond: jnp.ndarray,
        hint: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Full image→image inpaint: encode, masked regenerate, decode, and
        pixel-composite the untouched region back (exact outside the mask,
        like the edit pipeline's mask write-back, ad_pipeline.py:229-242)."""
        ek, ik = jax.random.split(key)
        lat0 = self.pipe.image_to_latent(images, ek)
        mlat = mask_to_latent(mask, lat0.shape[1], self.cfg.mask_blur)
        lat = self.inpaint_latents(ik, lat0, mlat, ctx_cond, ctx_uncond, hint)
        out = self.pipe.latent_to_image(lat)
        mpix = jnp.asarray(np.asarray(mask, np.float32))[None, :, :, None]
        return mpix * out + (1.0 - mpix) * images
