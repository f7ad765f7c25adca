"""Training engine: jitted train step + host-side loop with refinement cadence.

Functional equivalent of the reference's trainer
(/root/reference/gaussctrl/gc_trainer.py): per-step loss
``(1-λ)L1 + λ(1-SSIM)`` against the (possibly edited) cached train images,
7-group Adam updates (engine/optimizers.py), densify/prune callbacks at
splatfacto's cadence (models/densify.py), periodic checkpointing. The whole
device step — render fwd+bwd, optimizer update, stats accumulation — is ONE
jitted function; the host loop only picks cameras and fires the (also jitted)
refinement at the right steps.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..cameras import Camera
from ..models.densify import (
    DensifyConfig,
    DensifyStats,
    accumulate_stats,
    refine,
    reset_opacity,
)
from ..models.gaussians import GaussianParams, GaussianState
from ..models.splat_model import SplatModelConfig, render_model
from ..ops.ssim import splatfacto_loss
from .optimizers import make_gaussian_optimizer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    ssim_lambda: float = 0.2
    max_steps: int = 30_000
    densify: DensifyConfig = DensifyConfig()
    model: SplatModelConfig = SplatModelConfig()
    seed: int = 42


class TrainState(NamedTuple):
    params: GaussianParams
    alive: jnp.ndarray
    opt_state: optax.OptState
    stats: DensifyStats
    step: jnp.ndarray
    key: jax.Array


def init_train_state(gs: GaussianState, cfg: TrainConfig, optimizer=None) -> TrainState:
    optimizer = optimizer or make_gaussian_optimizer(max_steps=cfg.max_steps)
    return TrainState(
        params=gs.params,
        alive=gs.alive,
        opt_state=optimizer.init(gs.params),
        stats=DensifyStats.zero(gs.params.capacity),
        step=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(cfg.seed),
    )


def make_train_step(cfg: TrainConfig, optimizer=None):
    optimizer = optimizer or make_gaussian_optimizer(max_steps=cfg.max_steps)

    @jax.jit
    def train_step(state: TrainState, camera: Camera, gt: jnp.ndarray):
        key, bg_key = jax.random.split(state.key)
        img_max_dim = float(max(camera.width, camera.height))

        def loss_fn(params: GaussianParams, xys_offset: jnp.ndarray):
            out = render_model(
                GaussianState(params, state.alive),
                camera,
                state.step,
                cfg.model,
                training=True,
                background_key=bg_key,
                xys_offset=xys_offset,
            )
            loss, metrics = splatfacto_loss(out.rgb, gt, cfg.ssim_lambda)
            return loss, (out, metrics)

        xys_offset = jnp.zeros((state.params.capacity, 2))
        (loss, (out, metrics)), (pgrads, xys_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, xys_offset)

        updates, opt_state = optimizer.update(pgrads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        stats = accumulate_stats(state.stats, xys_grad, out.render.proj.radii, img_max_dim)
        new_state = TrainState(
            params=params,
            alive=state.alive,
            opt_state=opt_state,
            stats=stats,
            step=state.step + 1,
            key=key,
        )
        metrics = dict(metrics)
        metrics["n_isects"] = out.render.bins.n_isects
        return new_state, metrics

    return train_step


def make_refine_step(cfg: TrainConfig, img_max_dim: float):
    @jax.jit
    def refine_step(state: TrainState):
        key, rkey = jax.random.split(state.key)
        gs, opt_state, stats, info = refine(
            GaussianState(state.params, state.alive),
            state.opt_state,
            state.stats,
            state.step,
            rkey,
            cfg.densify,
            img_max_dim,
        )
        return (
            TrainState(gs.params, gs.alive, opt_state, stats, state.step, key),
            info,
        )

    return refine_step


def make_reset_opacity_step(cfg: TrainConfig):
    @jax.jit
    def reset_step(state: TrainState):
        gs, opt_state = reset_opacity(
            GaussianState(state.params, state.alive), state.opt_state, cfg.densify
        )
        return TrainState(gs.params, gs.alive, opt_state, state.stats, state.step, state.key)

    return reset_step


class Trainer:
    """Host-side loop: sample views, step, refine at cadence (gc_trainer.py:176-255)."""

    def __init__(self, gs: GaussianState, datamanager, cfg: TrainConfig = TrainConfig()):
        self.cfg = cfg
        self.dm = datamanager
        self.optimizer = make_gaussian_optimizer(max_steps=cfg.max_steps)
        self.state = init_train_state(gs, cfg, self.optimizer)
        self.train_step = make_train_step(cfg, self.optimizer)
        self.refine_step = make_refine_step(
            cfg, float(max(self.dm.width, self.dm.height))
        )
        self.reset_opacity_step = make_reset_opacity_step(cfg)
        self.step = 0
        self.history: list[dict] = []

    def train(self, num_steps: int, log_every: int = 50, callback=None):
        d = self.cfg.densify
        for _ in range(num_steps):
            view_idx, gt = self.dm.next_train()
            camera = self.dm.camera(view_idx)
            self.state, metrics = self.train_step(self.state, camera, jnp.asarray(gt))
            self.step += 1

            # AFTER_TRAIN_ITERATION callbacks (densify/prune/opacity reset)
            if (
                self.step > d.warmup_length
                and self.step % d.refine_every == 0
            ):
                reset_period = d.reset_alpha_every * d.refine_every
                do_reset_soon = (self.step % reset_period) < d.refine_every * 2
                if self.step < d.stop_split_at and not do_reset_soon:
                    self.state, info = self.refine_step(self.state)
                elif self.step >= d.stop_split_at:
                    self.state, info = self.refine_step(self.state)  # cull-only regime
                if self.step % reset_period == 0 and self.step < d.stop_split_at:
                    self.state = self.reset_opacity_step(self.state)

            if self.step % log_every == 0 or self.step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                m["step"] = self.step
                m["n_alive"] = int(jax.device_get(jnp.sum(self.state.alive)))
                self.history.append(m)
                if callback:
                    callback(m)
        return self.state
