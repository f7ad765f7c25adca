"""DDIM forward + inverse schedulers (Stable-Diffusion 1.x configuration).

From-scratch jnp implementations with the semantics the reference relies on
(/root/reference/gaussctrl/ad_pipeline.py:101-102 loads diffusers'
``DDIMScheduler`` / ``DDIMInverseScheduler`` from the SD-1.4 config:
scaled-linear betas 0.00085→0.012 over 1000 train steps, steps_offset 1,
no sample clipping, ``set_alpha_to_one=False``, prediction_type "epsilon").

Deterministic (η=0, ad_pipeline.py sets eta=0.0) so the 20-step inversion →
20-step regeneration roundtrip is exact up to model error — the property
GaussCtrl's editing hinges on.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    prediction_type: str = "epsilon"


def _alphas_cumprod(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps) ** 2
        )
    elif cfg.beta_schedule == "linear":
        betas = np.linspace(cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps)
    else:
        raise ValueError(cfg.beta_schedule)
    return np.cumprod(1.0 - betas).astype(np.float32)


class DDIMScheduler:
    """Denoising (reverse-time) DDIM."""

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.alphas_cumprod = jnp.asarray(_alphas_cumprod(cfg))
        self.final_alpha_cumprod = (
            jnp.asarray(1.0, jnp.float32) if cfg.set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.timesteps: np.ndarray | None = None

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """diffusers 'leading' spacing + steps_offset (SD default)."""
        step = self.cfg.num_train_timesteps // num_inference_steps
        t = (np.arange(0, num_inference_steps) * step).round()[::-1].astype(np.int64)
        t = t + self.cfg.steps_offset
        self.num_inference_steps = num_inference_steps
        self.timesteps = t  # descending, e.g. [951, 901, …, 1]
        return t

    def step(self, model_eps: jnp.ndarray, timestep: int, sample: jnp.ndarray) -> jnp.ndarray:
        """One deterministic DDIM update x_t → x_{t-Δ} (η=0, ε-prediction)."""
        step = self.cfg.num_train_timesteps // self.num_inference_steps
        prev_t = timestep - step
        a_t = self.alphas_cumprod[timestep]
        a_prev = jnp.where(
            prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], self.final_alpha_cumprod
        )
        x0 = (sample - jnp.sqrt(1.0 - a_t) * model_eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * model_eps

    def add_noise(self, sample, noise, timestep):
        a = self.alphas_cumprod[timestep]
        return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise


class DDIMInverseScheduler:
    """Inversion (forward-time) DDIM: image latent → noise latent.

    Mirrors diffusers' DDIMInverseScheduler on the same config: timesteps run
    ascending and each step maps x_t → x_{t+Δ} using the ε prediction at t.
    """

    def __init__(self, cfg: SchedulerConfig = SchedulerConfig()):
        self.cfg = cfg
        self.alphas_cumprod = jnp.asarray(_alphas_cumprod(cfg))
        # diffusers uses alpha at t=0 for the "initial" boundary
        self.initial_alpha_cumprod = jnp.asarray(1.0, jnp.float32)
        self.timesteps: np.ndarray | None = None

    def set_timesteps(self, num_inference_steps: int) -> np.ndarray:
        step = self.cfg.num_train_timesteps // num_inference_steps
        t = (np.arange(0, num_inference_steps) * step).round().astype(np.int64)
        t = t + self.cfg.steps_offset
        self.num_inference_steps = num_inference_steps
        self.timesteps = t  # ascending, e.g. [1, 51, …, 951]
        return t

    def step(self, model_eps: jnp.ndarray, timestep: int, sample: jnp.ndarray) -> jnp.ndarray:
        step = self.cfg.num_train_timesteps // self.num_inference_steps
        prev_t = timestep - step  # the "source" time of this sample
        a_prev = jnp.where(
            prev_t >= 0, self.alphas_cumprod[jnp.maximum(prev_t, 0)], self.initial_alpha_cumprod
        )
        a_t = self.alphas_cumprod[timestep]
        x0 = (sample - jnp.sqrt(1.0 - a_prev) * model_eps) / jnp.sqrt(a_prev)
        return jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * model_eps
