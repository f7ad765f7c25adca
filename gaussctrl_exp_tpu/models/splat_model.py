"""The splat model: parameter transforms + SH schedule + render outputs.

Functional equivalent of ``GaussCtrlModel.get_outputs``
(/root/reference/gaussctrl/gc_model.py:77-241): applies exp(scales),
sigmoid(opacities), normalizes quats, evaluates SH with the degree schedule
``min(step // sh_degree_interval, sh_degree)`` (:199), selects the background
(random during training if configured, :93-106), renders rgb/alpha/depth via
the ops pipeline, and supports a crop box (:108-113) via the extra mask.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..cameras import Camera, camera_matrices, projection_matrix_ogl, view_matrix
from ..ops.renderer import RenderConfig, RenderOutputs, render
from ..ops.sh import eval_sh
from .gaussians import GaussianParams, GaussianState


@dataclasses.dataclass(frozen=True)
class SplatModelConfig:
    sh_degree: int = 3
    sh_degree_interval: int = 1000
    background_color: str = "random"  # random | white | black
    render: RenderConfig = RenderConfig()


class ModelOutputs(NamedTuple):
    rgb: jnp.ndarray
    alpha: jnp.ndarray
    depth: Optional[jnp.ndarray]
    render: RenderOutputs
    mat_view: jnp.ndarray  # un-flipped view matrix (gc_model.py:120-127 "viewmat0")
    mat_proj: jnp.ndarray  # OpenGL projection (gc_model.py:148 "projmat0")
    mat_c2w: jnp.ndarray


def pick_background(cfg: SplatModelConfig, training: bool, key: Optional[jax.Array]) -> jnp.ndarray:
    if training and cfg.background_color == "random" and key is not None:
        return jax.random.uniform(key, (3,))
    if cfg.background_color == "white":
        return jnp.ones(3)
    if cfg.background_color == "black":
        return jnp.zeros(3)
    return jnp.ones(3) if not training else jnp.zeros(3)


def model_colors(
    params: GaussianParams, camera: Camera, step, cfg: SplatModelConfig
) -> jnp.ndarray:
    """Per-gaussian RGB from SH with the reference's degree schedule."""
    coeffs = jnp.concatenate([params.features_dc[:, None, :], params.features_rest], axis=1)
    if cfg.sh_degree > 0:
        cam_pos = camera.c2w[:3, 3]
        viewdirs = jax.lax.stop_gradient(params.means) - jax.lax.stop_gradient(cam_pos)
        viewdirs = viewdirs / jnp.maximum(jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12)
        n = jnp.minimum(step // cfg.sh_degree_interval, cfg.sh_degree)
        rgbs = eval_sh(n, viewdirs, coeffs)
        return jnp.maximum(rgbs + 0.5, 0.0)  # gc_model.py:201
    return jax.nn.sigmoid(params.features_dc)  # gc_model.py:203


def render_model(
    state: GaussianState,
    camera: Camera,
    step,
    cfg: SplatModelConfig,
    *,
    training: bool = False,
    background_key: Optional[jax.Array] = None,
    background_override: Optional[jnp.ndarray] = None,
    crop_mask: Optional[jnp.ndarray] = None,
    xys_offset: Optional[jnp.ndarray] = None,
) -> ModelOutputs:
    params = state.params
    background = (
        background_override
        if background_override is not None
        else pick_background(cfg, training, background_key)
    )
    colors = model_colors(params, camera, step, cfg)
    extra_mask = state.alive if crop_mask is None else (state.alive & crop_mask)
    # the training loss consumes only rgb (the reference renders depth only
    # at eval, gc_model.py:224-238) — drop the depth blend channel in the
    # jitted train step
    rcfg = (
        dataclasses.replace(cfg.render, render_depth=False) if training else cfg.render
    )
    out = render(
        params.means,
        jnp.exp(params.scales),
        params.quats,
        colors,
        jax.nn.sigmoid(params.opacities[:, 0]),
        camera,
        background,
        rcfg,
        extra_mask=extra_mask,
        xys_offset=xys_offset,
    )
    vm0 = view_matrix(camera.c2w, gsplat_flip=False)
    pm0 = projection_matrix_ogl(0.001, 1000.0, camera.fovx, camera.fovy)
    return ModelOutputs(
        rgb=out.rgb,
        alpha=out.alpha,
        depth=out.depth,
        render=out,
        mat_view=vm0,
        mat_proj=pm0,
        mat_c2w=camera.c2w,
    )
