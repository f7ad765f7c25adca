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
    # patch LPIPS term — reference-default ON (gc_model.py:63-69:
    # use_lpips=True, patch_size 32, lpips_loss_mult 1.0). The term needs
    # pretrained VGG weights passed as ``lpips=`` to Trainer/make_train_step
    # (ops.lpips.load_lpips); when none are attached the step DOWNGRADES
    # with a loud warning instead of silently diverging from the reference.
    use_lpips: bool = True
    patch_size: int = 32
    lpips_loss_mult: float = 1.0
    lpips_patches: int = 8  # random patches sampled per step
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


def _sample_patches(key, a, b, patch_size: int, n: int):
    """n random aligned (patch_size² , 3) crops of both images (the jitted
    equivalent of the reference's 32-px LPIPS patches, gc_model.py:67-69)."""
    H, W, _ = a.shape
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (n,), 0, H - patch_size + 1)
    xs = jax.random.randint(kx, (n,), 0, W - patch_size + 1)

    def cut(img):
        return jax.vmap(
            lambda y, x: jax.lax.dynamic_slice(img, (y, x, 0), (patch_size, patch_size, img.shape[-1]))
        )(ys, xs)

    return cut(a), cut(b)


def make_train_step(cfg: TrainConfig, optimizer=None, lpips=None):
    """``lpips``: optional (LPIPS module, params) pair — e.g.
    ops.lpips.load_lpips(...) at deployment or lpips_random() in tests —
    enabling the reference's patch-LPIPS loss term when cfg.use_lpips."""
    optimizer = optimizer or make_gaussian_optimizer(max_steps=cfg.max_steps)
    cam_optimizer = make_camera_optimizer(cfg) if cfg.camera_opt else None
    if cfg.use_lpips and lpips is None:
        import warnings

        warnings.warn(
            "use_lpips=True (the reference default, gc_model.py:63-69) but no "
            "VGG/LPIPS weights were attached — training proceeds with "
            "L1+SSIM only. Pass lpips=ops.lpips.load_lpips(...) to enable "
            "the reference's patch-LPIPS term.",
            stacklevel=2,
        )

    @jax.jit
    def train_step(state: TrainState, camera: Camera, gt: jnp.ndarray, view_idx=0):
        key, bg_key, patch_key = jax.random.split(state.key, 3)
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
            if cfg.use_lpips and lpips is not None:
                lp_model, lp_params = lpips
                pp, gp = _sample_patches(patch_key, out.rgb, gt, cfg.patch_size, cfg.lpips_patches)
                lp = jnp.mean(lp_model.apply({"params": lp_params}, pp, gp))
                loss = loss + cfg.lpips_loss_mult * lp
                metrics = dict(metrics, lpips=lp, main_loss=loss)
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
        # per-parameter-group gradient norms — the reference's "Gradients/"
        # scalar family (gc_trainer.py:283-292), one norm per optimizer group
        total_sq = 0.0
        for name, leaf in pgrads._asdict().items():
            sq = jnp.sum(leaf * leaf)
            metrics[f"Gradients/{name}"] = jnp.sqrt(sq)
            total_sq = total_sq + sq
        metrics["Gradients/Total"] = jnp.sqrt(total_sq)
        metrics["n_isects"] = out.render.bins.n_isects
        metrics["n_extra"] = out.render.bins.n_extra
        metrics["n_aligned"] = out.render.bins.n_aligned
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

    def __init__(self, gs: GaussianState, datamanager, cfg: TrainConfig = TrainConfig(),
                 lpips=None, auto_rebucket: bool = True):
        self.cfg = cfg
        self.dm = datamanager
        self.lpips = lpips
        self.auto_rebucket = auto_rebucket
        self.optimizer = make_gaussian_optimizer(max_steps=cfg.max_steps)
        self.state = init_train_state(gs, cfg, self.optimizer, num_views=len(datamanager))
        self.train_step = make_train_step(cfg, self.optimizer, lpips=lpips)
        self.refine_step = make_refine_step(
            cfg, float(max(self.dm.width, self.dm.height))
        )
        self.reset_opacity_step = make_reset_opacity_step(cfg)
        self.step = 0
        self.history: list[dict] = []
        self._eval_fn = None
        # capacity safety (ops/binning.py's "overflow is reported" promise):
        # every n_isects the device reports is checked against the bucket at
        # log cadence AND on the first step after every refine — a
        # densify-driven overflow re-buckets (recompiles) instead of silently
        # truncating intersections
        self._check_rebucket = True

    def _maybe_rebucket(self, n_isects: int, n_aligned: int = 0,
                        n_extra: int = 0) -> bool:
        """Grow the static isect bucket when the scene approaches/exceeds it.

        Returns True when the jitted step was rebuilt at a larger capacity.
        Threshold 0.92: re-bucket BEFORE truncation (estimate_capacity's 1.08
        bench slack would already be eaten at that point). A host-estimated
        ``aligned_capacity`` that the scene outgrows falls back to the safe
        worst case (None) in the same rebuild. The k>=1 expansion stream
        (binning first-tile direct emission) has its own static size derived
        from (capacity, N) — its overflow re-buckets the main capacity high
        enough that the derived extra capacity regains slack."""
        from ..ops.binning import _extra_capacity, round_capacity

        cap = self.cfg.model.render.isect_capacity
        acap = self.cfg.model.render.aligned_capacity
        n_param = int(self.state.params.means.shape[0])
        ecap = _extra_capacity(cap, n_param)
        aligned_over = acap is not None and n_aligned > int(acap * 0.92)
        extra_over = n_extra > int(ecap * 0.92)
        if not self.auto_rebucket or (
            n_isects <= int(cap * 0.92) and not aligned_over and not extra_over
        ):
            return False

        new_cap = cap
        if n_isects > int(cap * 0.92):
            new_cap = round_capacity(max(n_isects, cap + 1), slack=1.5)
        if extra_over:
            # capacity such that _extra_capacity(new_cap, N) >= 1.5 * n_extra
            new_cap = max(new_cap, round_capacity(n_param + int(n_extra * 1.5),
                                                  slack=1.0))
        render_cfg = dataclasses.replace(
            self.cfg.model.render, isect_capacity=new_cap,
            aligned_capacity=None if aligned_over else acap,
        )
        model_cfg = dataclasses.replace(self.cfg.model, render=render_cfg)
        self.cfg = dataclasses.replace(self.cfg, model=model_cfg)
        self.train_step = make_train_step(self.cfg, self.optimizer, lpips=self.lpips)
        self._eval_fn = None  # eval renders use cfg.model too
        self.history.append(
            {"step": self.step, "capacity_rebucket_from": cap,
             "capacity_rebucket_to": new_cap, "n_isects": n_isects}
        )
        return True

    def train(self, num_steps: int, log_every: int = 50, callback=None):
        d = self.cfg.densify
        for _ in range(num_steps):
            view_idx, gt = self.dm.next_train()
            camera = self.dm.camera(view_idx)
            self.state, metrics = self.train_step(
                self.state, camera, jnp.asarray(gt), jnp.int32(view_idx)
            )
            self.step += 1

            # Consume the rebucket flag BEFORE this iteration's refine: the
            # flag was set by the PREVIOUS iteration's densify, so `metrics`
            # here are the first post-densify measurement (a check placed
            # after the refine block would read pre-densify isect counts and
            # silently truncate until the next boundary)
            if self._check_rebucket:
                self._check_rebucket = False
                self._maybe_rebucket(int(jax.device_get(metrics["n_isects"])),
                                     int(jax.device_get(metrics["n_aligned"])),
                                     int(jax.device_get(metrics["n_extra"])))

            # AFTER_TRAIN_ITERATION callbacks — EXACT splatfacto cadence
            # (nerfstudio splatfacto.refinement_after, inherited by the
            # reference via gc_model.py:31): densify only once every image
            # has been seen since the last opacity reset (in-cycle position
            # > num_train_data + refine_every); cull-only after stop_split_at
            # when continue_cull_post_densification; opacity reset one
            # refine-cycle after each reset_interval boundary.
            if (
                self.step > d.warmup_length
                and self.step % d.refine_every == 0
            ):
                reset_interval = d.reset_alpha_every * d.refine_every
                pos = self.step % reset_interval
                num_train = len(self.dm)
                do_densify = (
                    self.step < d.stop_split_at
                    and pos > num_train + d.refine_every
                )
                if do_densify:
                    self.state, info = self.refine_step(self.state)
                    self._check_rebucket = True  # next step re-measures isects
                elif (
                    self.step >= d.stop_split_at
                    and d.continue_cull_post_densification
                ):
                    self.state, info = self.refine_step(self.state)  # cull-only
                if self.step < d.stop_split_at and pos == d.refine_every:
                    self.state = self.reset_opacity_step(self.state)

            if self.step % log_every == 0 or self.step == 1:
                m = {k: float(v) for k, v in metrics.items()}
                self._maybe_rebucket(int(m["n_isects"]), int(m["n_aligned"]),
                                     int(m["n_extra"]))
                m["step"] = self.step
                m["n_alive"] = int(jax.device_get(jnp.sum(self.state.alive)))
                # device-memory scalar (reference: GPU Memory (MB),
                # gc_trainer.py:212-223); TPU/GPU backends expose
                # memory_stats, CPU returns None — skip there
                try:
                    stats = jax.local_devices()[0].memory_stats()
                    if stats and "bytes_in_use" in stats:
                        m["Device Memory (MB)"] = round(stats["bytes_in_use"] / 2**20, 1)
                except Exception:
                    pass
                self.history.append(m)
                if callback:
                    callback(m)
        return self.state

    def evaluate(self, view_indices=None) -> dict:
        """Eval-split image metrics: mean PSNR/SSIM (+ LPIPS when weights are
        attached) over the given views — the reference's periodic image-metric
        eval inherited from splatfacto (gc_trainer.py:226-232, gc_config.py:43)."""
        from ..ops.ssim import psnr as psnr_fn
        from ..ops.ssim import ssim as ssim_fn

        if self._eval_fn is None:

            @jax.jit
            def _eval(state: TrainState, camera: Camera, gt: jnp.ndarray):
                out = render_model(
                    GaussianState(state.params, state.alive), camera, state.step, self.cfg.model
                )
                rgb = jnp.clip(out.rgb, 0.0, 1.0)
                m = {"eval_psnr": psnr_fn(rgb, gt), "eval_ssim": ssim_fn(rgb, gt)}
                if self.lpips is not None:
                    lp_model, lp_params = self.lpips
                    m["eval_lpips"] = jnp.mean(
                        lp_model.apply({"params": lp_params}, rgb[None], gt[None])
                    )
                return m

            self._eval_fn = _eval

        indices = view_indices if view_indices is not None else self.dm.eval_indices()
        acc: dict[str, float] = {}
        for idx in indices:
            gt = jnp.asarray(self.dm.image(idx))
            m = self._eval_fn(self.state, self.dm.camera(idx), gt)
            for k, v in m.items():
                acc[k] = acc.get(k, 0.0) + float(v)
        return {k: v / max(len(list(indices)), 1) for k, v in acc.items()}
