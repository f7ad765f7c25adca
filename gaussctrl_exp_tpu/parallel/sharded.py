"""Multi-chip sharded rendering + training via shard_map over a 2D device mesh.

The reference is single-GPU (torch-DDP plumbing only, never exercised —
/root/reference/gaussctrl/gc_trainer.py:52, ad_pipeline.py:290). This module
*introduces* the parallelism the TPU build is judged on (SURVEY.md §2.4/§5.8,
BASELINE.md): primitive(Gaussian)-sharding + image-tile-sharding with gradient
reduction over ICI.

Design (mesh axes ``(data, model)``):
  * Gaussian parameters are sharded over ``model`` on the leading axis and
    replicated over ``data``; each camera of the batch belongs to one ``data``
    group.
  * Each device projects ITS gaussians for ITS camera (EWA + SH: fully local,
    N/D work), producing the compact per-gaussian render payload
    (xy, conic, opacity, color, depth — 10 floats vs 59 raw parameters).
  * The compact payload is all-gathered over ``model`` (the cheap collective,
    riding ICI), then each device bins + blends only ITS HORIZONTAL TILE BAND
    of the image (H/model rows, a multiple of the 16-px tile).
  * The loss is computed on local bands and psum-reduced. In the backward
    pass, shard_map's autodiff turns the all-gather into a reduce-scatter of
    payload gradients, so each device ends up with gradients for exactly its
    own gaussians — the "grad all-reduce over ICI overlapped with backward" of
    the baseline spec falls out of XLA's collective scheduling.

Run on real hardware with a TPU mesh, or on CPU with
``XLA_FLAGS=--xla_force_host_platform_device_count=N`` (see tests and
``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..cameras import Camera, camera_matrices
from ..models.gaussians import GaussianParams
from ..ops.binning import bin_gaussians
from ..ops.projection import BLOCK, project_gaussians
from ..ops.renderer import RenderConfig
from ..ops.sh import eval_sh
from ..ops.ssim import ssim_map
from .. import cameras as cameras_lib


def make_mesh(data: int, model: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= data * model, f"need {data*model} devices, have {len(devices)}"
    devs = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(devs, axis_names=("data", "model"))


@dataclasses.dataclass(frozen=True)
class ShardedRenderConfig:
    height: int = 512
    width: int = 512
    isect_capacity_per_device: int = 1 << 16  # per tile-band
    sh_degree: int = 3
    impl: str = "auto"  # band blend impl: "jnp" | "pallas" | "auto" (pallas on TPU)
    pallas_interpret: bool = False  # interpret-mode pallas (CPU validation)
    max_per_tile: int = 512
    ssim_lambda: float = 0.2


def _band_blend(payload, band_idx, n_bands, cfg: ShardedRenderConfig):
    """Blend one horizontal tile band from the full gathered payload.

    payload: dict of full-N arrays (xys, depths, conics, opacs, colors, mask,
    tile_bbox) with tile_bbox already in band-local coordinates clipped to the
    band. Returns (band_img (Hb, W, C), band_finalT (Hb, W)).
    """
    from ..ops import blend as blend_jnp
    from ..ops.projection import ProjectedGaussians

    H, W = cfg.height, cfg.width
    Hb = H // n_bands
    tiles_x = (W + BLOCK - 1) // BLOCK
    tiles_y_band = Hb // BLOCK

    proj = ProjectedGaussians(
        xys=payload["xys"],
        depths=payload["depths"],
        radii=payload["radii"],
        conics=payload["conics"],
        num_tiles_hit=payload["num_tiles_hit"],
        cov3d=None,
        mask=payload["mask"],
        tile_bbox=payload["tile_bbox"],
    )
    bins = bin_gaussians(proj, tiles_x, tiles_y_band, cfg.isect_capacity_per_device)
    chan = jnp.concatenate([payload["colors"], payload["depths"][:, None]], axis=-1)
    from ..ops.renderer import _resolve_impl

    if _resolve_impl(cfg.impl) == "pallas":
        from ..ops.blend_pallas import rasterize_tiles_pallas

        out = rasterize_tiles_pallas(
            payload["xys"], payload["conics"], chan, payload["opacs"], bins, Hb, W,
            interpret=cfg.pallas_interpret,
        )
    else:
        order = bins.order
        out = blend_jnp.rasterize_tiles_jnp(
            payload["xys"][order],
            payload["conics"][order],
            chan[order],
            payload["opacs"][order],
            bins,
            Hb,
            W,
            cfg.max_per_tile,
        )
    return out.img, out.final_T


def _project_local(params: GaussianParams, alive, camera_arrays, step, cfg: ShardedRenderConfig):
    """Project + shade the local gaussian shard for one camera (all local math)."""
    c2w, fx, fy, cx, cy = camera_arrays
    cam = Camera(c2w=c2w, fx=fx, fy=fy, cx=cx, cy=cy, width=cfg.width, height=cfg.height)
    viewmat, projmat, fullmat = camera_matrices(cam)
    proj = project_gaussians(
        params.means,
        jnp.exp(params.scales),
        1.0,
        params.quats,
        viewmat,
        fullmat,
        fx,
        fy,
        cx,
        cy,
        cfg.height,
        cfg.width,
        extra_mask=alive,
        opacities=jax.nn.sigmoid(params.opacities[:, 0]),
    )
    coeffs = jnp.concatenate([params.features_dc[:, None, :], params.features_rest], axis=1)
    viewdirs = jax.lax.stop_gradient(params.means) - c2w[:3, 3]
    viewdirs = viewdirs / jnp.maximum(jnp.linalg.norm(viewdirs, axis=-1, keepdims=True), 1e-12)
    colors = jnp.maximum(eval_sh(jnp.minimum(step // 1000, cfg.sh_degree), viewdirs, coeffs) + 0.5, 0.0)
    opacs = jax.nn.sigmoid(params.opacities[:, 0])
    return proj, colors, opacs


def make_sharded_render_loss(mesh: Mesh, cfg: ShardedRenderConfig):
    """Returns loss_fn(params, alive, camera_arrays, gt, step) differentiable
    wrt params; params sharded over 'model', cameras/gt batched over 'data'."""
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    H, W = cfg.height, cfg.width
    assert (H // n_model) % BLOCK == 0, "band height must be a multiple of 16"

    pspec_params = GaussianParams(
        means=PSpec("model"),
        scales=PSpec("model"),
        quats=PSpec("model"),
        features_dc=PSpec("model"),
        features_rest=PSpec("model"),
        opacities=PSpec("model"),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            pspec_params,
            PSpec("model"),
            (PSpec("data"), PSpec("data"), PSpec("data"), PSpec("data"), PSpec("data")),
            PSpec("data"),
            PSpec(),
        ),
        out_specs=PSpec(),
        check_vma=False,
    )
    def loss_fn(params, alive, camera_arrays, gt, step):
        band = jax.lax.axis_index("model")
        # one camera per data group (leading batch dim of size 1 locally)
        cam_local = tuple(a[0] for a in camera_arrays)
        gt_local = gt[0]  # (H, W, 3)

        proj, colors, opacs = _project_local(params, alive, cam_local, step, cfg)

        # compact payload all-gather over ICI ('model' axis)
        payload = {
            "xys": proj.xys,
            "depths": proj.depths,
            "radii": proj.radii,
            "conics": proj.conics,
            "num_tiles_hit": proj.num_tiles_hit,
            "mask": proj.mask,
            "tile_bbox": proj.tile_bbox,
            "colors": colors,
            "opacs": opacs,
        }
        payload = jax.tree.map(
            lambda x: jax.lax.all_gather(x, "model", axis=0, tiled=True), payload
        )

        # re-bin the bbox into my band's local tile coordinates
        Hb = H // n_model
        ty0 = band * (Hb // BLOCK)
        ty1 = (band + 1) * (Hb // BLOCK)
        bb = payload["tile_bbox"]
        y0 = jnp.clip(bb[:, 1], ty0, ty1) - ty0
        y1 = jnp.clip(bb[:, 3], ty0, ty1) - ty0
        in_band = (y1 > y0) & payload["mask"]
        bbox_band = jnp.stack([bb[:, 0], y0, bb[:, 2], y1], axis=-1)
        bbox_band = jnp.where(in_band[:, None], bbox_band, 0)
        area = (bbox_band[:, 2] - bbox_band[:, 0]) * (bbox_band[:, 3] - bbox_band[:, 1])
        payload["tile_bbox"] = bbox_band
        payload["num_tiles_hit"] = jnp.where(in_band, area, 0).astype(jnp.int32)
        payload["mask"] = in_band
        payload["radii"] = jnp.where(in_band, payload["radii"], 0)
        # shift centers into the band's local pixel frame
        payload["xys"] = payload["xys"] - jnp.asarray([0.0, band * Hb], jnp.float32)

        band_img, band_T = _band_blend(payload, band, n_model, cfg)
        band_rgb = jnp.minimum(band_img[..., :3], 1.0)  # black background

        # --- band-local loss with a 10-row halo exchange: per-chip loss
        # compute scales as H/n_model instead of replicating a full-image
        # SSIM on every shard. The 11-px window statistics are IDENTICAL to
        # the single-device loss (each band computes the output rows that
        # start inside it, using its lower neighbor's first 10 rows via
        # ppermute); only f32 summation order differs.
        KS = 10  # kernel_size 11 → halo of 10 rows
        halo = jax.lax.ppermute(
            band_rgb[:KS], "model", [(b + 1, b) for b in range(n_model - 1)]
        )  # band b receives band b+1's top rows; last band receives zeros
        pred_pad = jnp.concatenate([band_rgb, halo], axis=0)  # (Hb+10, W, 3)
        gt_pad = jnp.pad(gt_local, ((0, KS), (0, 0), (0, 0)))
        gt_band = jax.lax.dynamic_slice_in_dim(gt_pad, band * Hb, Hb + KS, axis=0)

        l1_sum = jnp.sum(jnp.abs(band_rgb - gt_band[:Hb]))
        smap = ssim_map(pred_pad, gt_band)  # (Hb, W-10, C)
        row_valid = (band * Hb + jnp.arange(Hb)) < (H - KS)
        ssim_sum = jnp.sum(jnp.where(row_valid[:, None, None], smap, 0.0))
        ssim_cnt = jnp.sum(row_valid) * smap.shape[1] * smap.shape[2]

        l1 = jax.lax.psum(l1_sum, "model") / (H * W * 3)
        ssim_val = jax.lax.psum(ssim_sum, "model") / jax.lax.psum(ssim_cnt, "model")
        loss_local = (1 - cfg.ssim_lambda) * l1 + cfg.ssim_lambda * (1 - ssim_val)
        # model-axis already reduced by the psums; mean over data groups
        loss = jax.lax.pmean(loss_local, "data")
        return loss

    return loss_fn


def make_sharded_train_step(mesh: Mesh, cfg: ShardedRenderConfig, optimizer):
    """Jitted sharded train step: (params, opt_state, cameras, gt, step) →
    (params, opt_state, loss). Params/opt-state sharded over 'model'."""
    loss_fn = make_sharded_render_loss(mesh, cfg)

    @jax.jit
    def step_fn(params, alive, opt_state, camera_arrays, gt, step):
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, alive, camera_arrays, gt, step)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step_fn


def shard_params(params: GaussianParams, alive, mesh: Mesh):
    """Place params on the mesh (leading axis over 'model'). Pads to a multiple
    of the model-axis size."""
    n_model = mesh.shape["model"]
    C = params.capacity
    pad = (-C) % n_model

    def prep(x):
        if pad:
            x = jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        return jax.device_put(x, NamedSharding(mesh, PSpec("model")))

    params = jax.tree.map(prep, params)
    alive = jnp.pad(alive, (0, pad)) if pad else alive
    alive = jax.device_put(alive, NamedSharding(mesh, PSpec("model")))
    return params, alive
