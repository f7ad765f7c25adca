"""Per-group Adam optimizers mirroring the reference's training recipe.

The reference trains 7 Adam groups (/root/reference/gaussctrl/gc_config.py:58-87):
  xyz 1.6e-4 (exp decay → 1.6e-6 over 30k), features_dc 2.5e-3,
  features_rest 2.5e-3/20, opacity 5e-2, scaling 5e-3, rotation 1e-3,
  all eps=1e-15; camera_opt 1e-3 → 5e-5 (handled by the trainer when camera
  optimization is enabled). Implemented as one ``optax.multi_transform`` over
  the GaussianParams pytree so the whole update is a single fused jitted op.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax

from ..models.gaussians import GaussianParams

ADAM_EPS = 1e-15
MAX_SCHED_STEPS = 30_000


def exp_decay(lr_init: float, lr_final: float, max_steps: int = MAX_SCHED_STEPS):
    """nerfstudio ExponentialDecayScheduler: lr_init·(lr_final/lr_init)^(t/T), clamped."""

    def schedule(count):
        t = jnp.minimum(count / max_steps, 1.0)
        return lr_init * (lr_final / lr_init) ** t

    return schedule


def make_gaussian_optimizer(
    lr_means: float = 1.6e-4,
    lr_means_final: float = 1.6e-6,
    lr_features_dc: float = 2.5e-3,
    lr_features_rest: float = 2.5e-3 / 20,
    lr_opacity: float = 5e-2,
    lr_scaling: float = 5e-3,
    lr_rotation: float = 1e-3,
    max_steps: int = MAX_SCHED_STEPS,
) -> optax.GradientTransformation:
    def adam(lr):
        return optax.adam(learning_rate=lr, eps=ADAM_EPS)

    transforms = {
        "means": adam(exp_decay(lr_means, lr_means_final, max_steps)),
        "features_dc": adam(lr_features_dc),
        "features_rest": adam(lr_features_rest),
        "opacities": adam(lr_opacity),
        "scales": adam(lr_scaling),
        "quats": adam(lr_rotation),
    }
    labels = GaussianParams(
        means="means",
        scales="scales",
        quats="quats",
        features_dc="features_dc",
        features_rest="features_rest",
        opacities="opacities",
    )
    return optax.multi_transform(transforms, labels)
