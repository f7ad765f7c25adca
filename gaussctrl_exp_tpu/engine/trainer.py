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
    # camera pose optimization (reference "camera_opt" group,
    # gc_config.py:50,84-87: lr 1e-3 → 5e-5, gradient accumulation 100)
    camera_opt: bool = False
    camera_opt_lr: float = 1e-3
    camera_opt_lr_final: float = 5e-5
    camera_opt_accum: int = 100


class TrainState(NamedTuple):
    params: GaussianParams
    alive: jnp.ndarray
    opt_state: optax.OptState
    stats: DensifyStats
    step: jnp.ndarray
    key: jax.Array
    cam_deltas: Optional[jnp.ndarray] = None  # (V, 6) pose adjustments
    cam_opt_state: Optional[optax.OptState] = None


def make_camera_optimizer(cfg: TrainConfig):
    from .optimizers import exp_decay

    inner = optax.adam(
        exp_decay(cfg.camera_opt_lr, cfg.camera_opt_lr_final, cfg.max_steps), eps=1e-15
    )
    return optax.MultiSteps(inner, every_k_schedule=cfg.camera_opt_accum)


def init_train_state(
    gs: GaussianState, cfg: TrainConfig, optimizer=None, num_views: int = 0
) -> TrainState:
    optimizer = optimizer or make_gaussian_optimizer(max_steps=cfg.max_steps)
    cam_deltas = cam_opt_state = None
    if cfg.camera_opt and num_views > 0:
        cam_deltas = jnp.zeros((num_views, 6))
        cam_opt_state = make_camera_optimizer(cfg).init(cam_deltas)
    return TrainState(
        params=gs.params,
        alive=gs.alive,
        opt_state=optimizer.init(gs.params),
        stats=DensifyStats.zero(gs.params.capacity),
        step=jnp.zeros((), jnp.int32),
        key=jax.random.PRNGKey(cfg.seed),
        cam_deltas=cam_deltas,
        cam_opt_state=cam_opt_state,
    )


def make_train_step(cfg: TrainConfig, optimizer=None):
    optimizer = optimizer or make_gaussian_optimizer(max_steps=cfg.max_steps)
    cam_optimizer = make_camera_optimizer(cfg) if cfg.camera_opt else None

    @jax.jit
    def train_step(state: TrainState, camera: Camera, gt: jnp.ndarray, view_idx=0):
        key, bg_key = jax.random.split(state.key)
        img_max_dim = float(max(camera.width, camera.height))
        use_cam = cfg.camera_opt and state.cam_deltas is not None

        def loss_fn(params: GaussianParams, xys_offset: jnp.ndarray, cam_deltas):
            cam = camera
            if use_cam:
                from ..models.camera_opt import apply_pose_delta

                cam = apply_pose_delta(camera, cam_deltas[view_idx])
            out = render_model(
                GaussianState(params, state.alive),
                cam,
                state.step,
                cfg.model,
                training=True,
                background_key=bg_key,
                xys_offset=xys_offset,
            )
            loss, metrics = splatfacto_loss(out.rgb, gt, cfg.ssim_lambda)
            return loss, (out, metrics)

        xys_offset = jnp.zeros((state.params.capacity, 2))
        cam_deltas = state.cam_deltas if use_cam else jnp.zeros((1, 6))
        (loss, (out, metrics)), (pgrads, xys_grad, cgrads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(state.params, xys_offset, cam_deltas)

        updates, opt_state = optimizer.update(pgrads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_cam_deltas, new_cam_opt = state.cam_deltas, state.cam_opt_state
        if use_cam:
            cupd, new_cam_opt = cam_optimizer.update(cgrads, state.cam_opt_state, cam_deltas)
            new_cam_deltas = optax.apply_updates(cam_deltas, cupd)

        stats = accumulate_stats(state.stats, xys_grad, out.render.proj.radii, img_max_dim)
        new_state = TrainState(
            params=params,
            alive=state.alive,
            opt_state=opt_state,
            stats=stats,
            step=state.step + 1,
            key=key,
            cam_deltas=new_cam_deltas,
            cam_opt_state=new_cam_opt,
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
            state._replace(
                params=gs.params, alive=gs.alive, opt_state=opt_state, stats=stats, key=key
            ),
            info,
        )

    return refine_step


def make_reset_opacity_step(cfg: TrainConfig):
    @jax.jit
    def reset_step(state: TrainState):
        gs, opt_state = reset_opacity(
            GaussianState(state.params, state.alive), state.opt_state, cfg.densify
        )
        return state._replace(params=gs.params, alive=gs.alive, opt_state=opt_state)

    return reset_step


class Trainer:
    """Host-side loop: sample views, step, refine at cadence (gc_trainer.py:176-255)."""

    def __init__(self, gs: GaussianState, datamanager, cfg: TrainConfig = TrainConfig()):
        self.cfg = cfg
        self.dm = datamanager
        self.optimizer = make_gaussian_optimizer(max_steps=cfg.max_steps)
        self.state = init_train_state(gs, cfg, self.optimizer, num_views=len(datamanager))
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
            self.state, metrics = self.train_step(
                self.state, camera, jnp.asarray(gt), jnp.int32(view_idx)
            )
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
