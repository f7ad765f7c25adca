"""Full differentiable render: project → bin → blend, as one pure function.

The TPU-shaped equivalent of the reference's
``GaussCtrlModel.get_outputs`` render core
(/root/reference/gaussctrl/gc_model.py:77-241): same outputs (rgb with
background compositing and clamp, accumulation/alpha, alpha-normalized depth
with 1000 fill at empty pixels) produced by one fused pass instead of two CUDA
rasterize calls.

Everything is static-shape: culling is a mask, "zero visible gaussians" renders
background naturally instead of early-returning (gc_model.py:189-190).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..cameras import Camera, camera_matrices
from . import blend as blend_jnp
from .binning import TileBins, bin_gaussians
from .projection import BLOCK, ProjectedGaussians, project_gaussians

DEPTH_EMPTY = 1000.0  # reference fills empty depth pixels with 1000 (gc_model.py:238)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rasterization configuration (part of the jit cache key)."""

    isect_capacity: int = 1 << 16  # static cap on gaussian-tile intersections
    # optional host-estimated cap on the CHUNK-aligned stream (None = safe
    # worst case); see ops/binning.py estimate_aligned_capacity
    aligned_capacity: Optional[int] = None
    max_per_tile: int = 512  # per-tile gaussian cap (jnp path only)
    tile_chunk: int = 32  # tiles blended per lax.map step (jnp path)
    impl: str = "auto"  # "jnp" | "pallas" | "auto"
    clip_thresh: float = 0.01
    render_depth: bool = True


class RenderOutputs(NamedTuple):
    rgb: jnp.ndarray  # (H, W, 3) in [0, 1]
    alpha: jnp.ndarray  # (H, W, 1)
    depth: Optional[jnp.ndarray]  # (H, W, 1) alpha-normalized, 1000 where empty
    proj: ProjectedGaussians
    bins: TileBins


def _resolve_impl(impl: str) -> str:
    if impl != "auto":
        return impl
    import jax

    # anything that isn't the CPU interpreter gets the Pallas kernels (the
    # TPU backend is named "axon" under the remote tunnel, not "tpu")
    return "jnp" if jax.default_backend() == "cpu" else "pallas"


def render(
    means: jnp.ndarray,
    scales: jnp.ndarray,  # already exp()ed
    quats: jnp.ndarray,
    colors: jnp.ndarray,  # (N, 3) post-SH rgb in [0, inf)
    opacities: jnp.ndarray,  # (N,) already sigmoid()ed
    camera: Camera,
    background: jnp.ndarray,  # (3,)
    cfg: RenderConfig = RenderConfig(),
    extra_mask: Optional[jnp.ndarray] = None,
    xys_offset: Optional[jnp.ndarray] = None,
) -> RenderOutputs:
    """``xys_offset``: optional (N, 2) zeros added to the projected centers
    AFTER binning. Its gradient is dL/d(screen xy) — the densification
    statistic the reference collects via ``xys.retain_grad()``
    (gc_model.py:193-194) — without making binning pretend to be
    differentiable."""
    H, W = camera.height, camera.width
    tiles_x = (W + BLOCK - 1) // BLOCK
    tiles_y = (H + BLOCK - 1) // BLOCK

    viewmat, projmat, fullmat = camera_matrices(camera)
    proj = project_gaussians(
        means,
        scales,
        1.0,
        quats,
        viewmat,
        fullmat,
        camera.fx,
        camera.fy,
        camera.cx,
        camera.cy,
        H,
        W,
        clip_thresh=cfg.clip_thresh,
        extra_mask=extra_mask,
        opacities=opacities.reshape(-1),
    )
    bins = bin_gaussians(
        proj, tiles_x, tiles_y, cfg.isect_capacity, cfg.aligned_capacity
    )

    xys = proj.xys if xys_offset is None else proj.xys + xys_offset
    chan = [colors]
    if cfg.render_depth:
        chan.append(proj.depths[:, None])
    chan = jnp.concatenate(chan, axis=-1)
    opacs = opacities.reshape(-1)

    impl = _resolve_impl(cfg.impl)
    if impl == "pallas":
        # pallas path takes original-order arrays (sorts internally via bins)
        import jax

        from .blend_pallas import rasterize_tiles_pallas

        interpret = jax.default_backend() == "cpu"  # CPU has no Mosaic — interpret
        out = rasterize_tiles_pallas(xys, proj.conics, chan, opacs, bins, H, W, interpret=interpret)
    else:
        order = bins.order
        out = blend_jnp.rasterize_tiles_jnp(
            xys[order],
            proj.conics[order],
            chan[order],
            opacs[order],
            bins,
            H,
            W,
            cfg.max_per_tile,
            cfg.tile_chunk,
        )

    final_T = out.final_T
    alpha = (1.0 - final_T)[..., None]
    rgb = out.img[..., :3] + final_T[..., None] * background.reshape(1, 1, 3)
    rgb = jnp.minimum(rgb, 1.0)  # gc_model.py:222 clamps max=1

    depth = None
    if cfg.render_depth:
        draw = out.img[..., 3:4]
        # reference: depth /= alpha where alpha > 0, 1000 where alpha == 0
        depth = jnp.where(alpha > 0.0, draw / jnp.where(alpha > 0.0, alpha, 1.0), DEPTH_EMPTY)

    return RenderOutputs(rgb=rgb, alpha=alpha, depth=depth, proj=proj, bins=bins)
