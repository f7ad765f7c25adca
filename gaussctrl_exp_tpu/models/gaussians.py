"""Gaussian scene parameters: a fixed-capacity pytree of arrays + alive mask.

The TPU-shaped replacement for splatfacto's six nn.Parameters
(means/scales/quats/features_dc/features_rest/opacities — the optimizer groups
at /root/reference/gaussctrl/gc_config.py:58-87). XLA wants static shapes, so
instead of growing/shrinking tensors during densify/prune the parameter arrays
are allocated at a fixed ``capacity`` with an ``alive`` mask; densification
writes into dead slots and pruning clears mask bits (see models/densify.py).

Initialization follows splatfacto: means from the seed point cloud, scales =
log(mean 3-NN distance), random quats, DC features from RGB via the inverse SH
DC transform, opacities = logit(0.1).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.sh import SH_C0, num_sh_bases


class GaussianParams(NamedTuple):
    """Optimizable parameters (raw/log/logit space, like splatfacto)."""

    means: jnp.ndarray  # (C, 3)
    scales: jnp.ndarray  # (C, 3) log-space
    quats: jnp.ndarray  # (C, 4) wxyz, unnormalized
    features_dc: jnp.ndarray  # (C, 3)
    features_rest: jnp.ndarray  # (C, K-1, 3)
    opacities: jnp.ndarray  # (C, 1) logit-space

    @property
    def capacity(self) -> int:
        return self.means.shape[0]


class GaussianState(NamedTuple):
    """Parameters + non-optimized bookkeeping."""

    params: GaussianParams
    alive: jnp.ndarray  # (C,) bool

    @property
    def num_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive)


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC SH band: color = SH_C0 * dc + 0.5."""
    return (rgb - 0.5) / SH_C0


def mean_knn_distance(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Host-side mean distance to k nearest neighbors (splatfacto scale init)."""
    n = points.shape[0]
    if n <= k:
        return np.full(n, 0.01, np.float32)
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    dists, _ = tree.query(points, k=k + 1)  # includes self at distance 0
    return dists[:, 1:].mean(axis=1).astype(np.float32)


def init_from_points(
    points_xyz: np.ndarray,
    points_rgb: Optional[np.ndarray],
    capacity: Optional[int] = None,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    seed: int = 0,
) -> GaussianState:
    n = points_xyz.shape[0]
    capacity = capacity or n
    if capacity < n:
        raise ValueError(f"capacity {capacity} < {n} seed points")
    K = num_sh_bases(sh_degree)
    rng = np.random.default_rng(seed)

    means = np.zeros((capacity, 3), np.float32)
    means[:n] = points_xyz
    # dead slots far away & tiny so they never rasterize even if mask were ignored
    means[n:] = 0.0

    dist = mean_knn_distance(points_xyz) if n > 1 else np.full(n, 0.01, np.float32)
    scales = np.full((capacity, 3), -10.0, np.float32)
    scales[:n] = np.log(np.maximum(dist, 1e-7))[:, None]

    quats = rng.normal(size=(capacity, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)

    fdc = np.zeros((capacity, 3), np.float32)
    if points_rgb is not None:
        fdc[:n] = np.asarray(rgb_to_sh_dc(points_rgb.astype(np.float32) / 255.0))
    else:
        fdc[:n] = rng.uniform(size=(n, 3)).astype(np.float32)
    frest = np.zeros((capacity, K - 1, 3), np.float32)

    opac = np.full((capacity, 1), np.log(init_opacity / (1 - init_opacity)), np.float32)

    alive = np.zeros(capacity, bool)
    alive[:n] = True

    params = GaussianParams(
        means=jnp.asarray(means),
        scales=jnp.asarray(scales),
        quats=jnp.asarray(quats),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.asarray(frest),
        opacities=jnp.asarray(opac),
    )
    return GaussianState(params=params, alive=jnp.asarray(alive))


def init_random(
    num: int, capacity: Optional[int] = None, sh_degree: int = 3, extent: float = 1.0, seed: int = 0
) -> GaussianState:
    """Random init inside ±extent box (splatfacto's no-seed-points fallback)."""
    rng = np.random.default_rng(seed)
    pts = (rng.uniform(size=(num, 3)).astype(np.float32) - 0.5) * 2 * extent
    rgb = (rng.uniform(size=(num, 3)) * 255).astype(np.uint8)
    return init_from_points(pts, rgb, capacity=capacity, sh_degree=sh_degree, seed=seed)
