"""On-device densify / prune / opacity-reset at fixed capacity.

Re-implements splatfacto's refinement machinery (inherited by the reference
via /root/reference/gaussctrl/gc_model.py:31,72; statistics fed by
``xys.retain_grad()`` at gc_model.py:193-194) as pure jitted functions over a
fixed-capacity Gaussian buffer with an alive mask — the XLA-friendly shape of
"append/remove tensors + optimizer-state surgery":

  * accumulate: per-step mean-2D-gradient norms, visibility counts, max 2D radii,
  * refine (every ``refine_every`` after ``warmup_length``):
      - high-grad & large → SPLIT into 2 children with scale/1.6 and random
        offsets sampled in the gaussian's own frame (child 1 reuses the
        parent's slot — the parent is culled after splitting in splatfacto —
        child 2 takes a dead slot),
      - high-grad & small → DUPLICATE into a dead slot,
      - cull low-opacity and (after the first opacity-reset period) too-big
        gaussians (world + screen size),
      - Adam moments zeroed at every slot that received a new gaussian
        (splatfacto's ``dup_in_all_optim``),
  * opacity reset every ``reset_alpha_every`` refines: clamp opacities to
    logit(2·cull_alpha_thresh) and zero the opacity Adam moments.

New gaussians are placed into dead slots with a scatter computed from a stable
argsort of the alive mask — no dynamic shapes anywhere. If demand exceeds dead
slots the overflow candidates are dropped and reported in the returned stats.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.quat import quat_to_rotmat
from .gaussians import GaussianParams, GaussianState


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    warmup_length: int = 500
    refine_every: int = 100
    densify_grad_thresh: float = 0.0002
    densify_size_thresh: float = 0.01
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    reset_alpha_every: int = 30  # × refine_every
    stop_split_at: int = 15_000
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4_000
    split_scale_div: float = 1.6
    continue_cull_post_densification: bool = True  # splatfacto default


class DensifyStats(NamedTuple):
    xys_grad_sum: jnp.ndarray  # (C,) accumulated ||dL/dxy||
    vis_count: jnp.ndarray  # (C,) int32
    max_radii2d: jnp.ndarray  # (C,) max radius / max(H, W)

    @staticmethod
    def zero(capacity: int) -> "DensifyStats":
        return DensifyStats(
            xys_grad_sum=jnp.zeros(capacity),
            vis_count=jnp.zeros(capacity, jnp.int32),
            max_radii2d=jnp.zeros(capacity),
        )


def accumulate_stats(
    stats: DensifyStats, xys_grad: jnp.ndarray, radii: jnp.ndarray, img_max_dim: float
) -> DensifyStats:
    visible = radii > 0
    norms = jnp.linalg.norm(xys_grad, axis=-1)
    return DensifyStats(
        xys_grad_sum=stats.xys_grad_sum + jnp.where(visible, norms, 0.0),
        vis_count=stats.vis_count + visible.astype(jnp.int32),
        max_radii2d=jnp.maximum(
            stats.max_radii2d, jnp.where(visible, radii.astype(jnp.float32) / img_max_dim, 0.0)
        ),
    )


def _zero_opt_rows(opt_state, row_mask: jnp.ndarray):
    """Zero optimizer-moment rows (any leaf whose leading dim == capacity)."""
    C = row_mask.shape[0]

    def f(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == C:
            m = row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
            return jnp.where(m, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(f, opt_state)


def _scatter_rows(leaf: jnp.ndarray, dest: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """leaf[dest[i]] = values[i] for dest[i] < C (dest == C drops into padding)."""
    C = leaf.shape[0]
    padded = jnp.concatenate([leaf, jnp.zeros_like(leaf[:1])], axis=0)
    return padded.at[dest].set(values, mode="drop")[:C]


def refine(
    state: GaussianState,
    opt_state,
    stats: DensifyStats,
    step: jnp.ndarray,
    key: jax.Array,
    cfg: DensifyConfig,
    img_max_dim: float,
):
    """One refinement pass (call at refine cadence). Returns
    (GaussianState, opt_state, zeroed stats, info dict)."""
    params = state.params
    alive = state.alive
    C = params.capacity

    avg_grad = stats.xys_grad_sum / jnp.maximum(stats.vis_count, 1) * 0.5 * img_max_dim
    seen = stats.vis_count > 0
    high_grad = (avg_grad > cfg.densify_grad_thresh) & alive & seen
    scale_max = jnp.exp(params.scales).max(axis=-1)

    do_densify = step < cfg.stop_split_at
    screen_active = step < cfg.stop_screen_size_at

    split_m = scale_max > cfg.densify_size_thresh
    split_m = split_m | (screen_active & (stats.max_radii2d > cfg.split_screen_size))
    split_m = split_m & high_grad & do_densify
    dup_m = (scale_max <= cfg.densify_size_thresh) & high_grad & do_densify

    # --- cull decided on pre-densify values (split parents are replaced, not culled)
    opac = jax.nn.sigmoid(params.opacities[:, 0])
    cull_m = (opac < cfg.cull_alpha_thresh) & alive
    toobig = (scale_max > cfg.cull_scale_thresh) | (
        screen_active & (stats.max_radii2d > cfg.cull_screen_size)
    )
    cull_m = cull_m | (toobig & alive & (step > cfg.refine_every * cfg.reset_alpha_every))
    cull_m = cull_m & ~split_m & ~dup_m  # slots being reused/kept by densify

    # --- children
    k1, k2, k3 = jax.random.split(key, 3)
    sc = jnp.exp(params.scales)
    rot = quat_to_rotmat(params.quats)  # normalizes internally
    off1 = jnp.einsum("nij,nj->ni", rot, jax.random.normal(k1, (C, 3)) * sc)
    off2 = jnp.einsum("nij,nj->ni", rot, jax.random.normal(k2, (C, 3)) * sc)
    child_scales = jnp.log(sc / cfg.split_scale_div)

    # in-place child 1 for splits
    new_params = params._replace(
        means=jnp.where(split_m[:, None], params.means + off1, params.means),
        scales=jnp.where(split_m[:, None], child_scales, params.scales),
    )

    # one NEW gaussian per split (child 2) or dup (copy): allocate dead slots
    cand_m = split_m | dup_m
    order = jnp.argsort(alive.astype(jnp.int32), stable=True)  # dead slots first, index order
    num_dead = C - jnp.sum(alive)
    cand_rank = jnp.cumsum(cand_m) - 1
    can_place = cand_m & (cand_rank < num_dead)
    dest = jnp.where(can_place, order[jnp.clip(cand_rank, 0, C - 1)], C)

    src_means = jnp.where(split_m[:, None], params.means + off2, params.means)
    src_scales = jnp.where(split_m[:, None], child_scales, params.scales)

    new_params = GaussianParams(
        means=_scatter_rows(new_params.means, dest, src_means),
        scales=_scatter_rows(new_params.scales, dest, src_scales),
        quats=_scatter_rows(new_params.quats, dest, params.quats),
        features_dc=_scatter_rows(new_params.features_dc, dest, params.features_dc),
        features_rest=_scatter_rows(new_params.features_rest, dest, params.features_rest),
        opacities=_scatter_rows(new_params.opacities, dest, params.opacities),
    )

    new_alive = alive & ~cull_m
    new_alive = _scatter_rows(
        new_alive, dest, jnp.ones(C, bool)
    )  # dest slots become alive

    # zero Adam moments at: new slots, in-place split children
    touched = jnp.zeros(C, bool)
    touched = _scatter_rows(touched, dest, jnp.ones(C, bool)) | split_m
    new_opt_state = _zero_opt_rows(opt_state, touched)

    info = {
        "n_split": jnp.sum(split_m),
        "n_dup": jnp.sum(dup_m),
        "n_cull": jnp.sum(cull_m),
        "n_dropped": jnp.sum(cand_m & ~can_place),
        "n_alive": jnp.sum(new_alive),
    }
    return (
        GaussianState(params=new_params, alive=new_alive),
        new_opt_state,
        DensifyStats.zero(C),
        info,
    )


def reset_opacity(state: GaussianState, opt_state, cfg: DensifyConfig):
    """Clamp opacities to logit(2·cull_alpha_thresh), zero opacity moments."""
    reset_val = cfg.cull_alpha_thresh * 2.0
    logit = jnp.log(reset_val / (1.0 - reset_val))
    params = state.params._replace(
        opacities=jnp.minimum(params_opac := state.params.opacities, logit)
    )
    # zero moments only for the opacity group
    C = params.capacity

    def f(path, leaf):
        if (
            hasattr(leaf, "ndim")
            and leaf.ndim >= 1
            and leaf.shape[0] == C
            and any(getattr(p, "name", "") == "opacities" for p in path)
        ):
            return jnp.zeros_like(leaf)
        return leaf

    new_opt = jax.tree_util.tree_map_with_path(f, opt_state)
    return GaussianState(params=params, alive=state.alive), new_opt
