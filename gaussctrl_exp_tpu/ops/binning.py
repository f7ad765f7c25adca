"""Tile binning: global depth sort + Gaussian→tile intersection expansion.

TPU-native replacement for gsplat v0.1.2's CUDA binning stage
(``map_gaussian_to_intersects`` → radix sort by (tile, depth) →
``get_tile_bin_edges``; surfaced in the reference at
/root/reference/gaussctrl/gc_model.py:150-155,174-188 via ``num_tiles_hit`` /
``tile_bounds``).

Design (static shapes, no scatter):
  1. Sort all N Gaussians by camera depth once (``argsort``). From here on,
     *rank* = index into the depth-sorted arrays; per-tile depth order is then
     inherited from rank order.
  2. Expand Gaussian→tile intersections WITHOUT a scatter: with ``cum`` the
     exclusive cumsum of per-Gaussian tile-hit counts (in rank order), slot
     ``i``'s Gaussian is ``searchsorted(cum, i) − 1`` and its k-th tile is
     decoded from the tile bbox — a pure gather, ideal for XLA.
  3. Stable-sort the fixed-capacity slot array by tile id. Stability preserves
     rank (=depth) order within each tile, reproducing the CUDA
     (tile, depth)-key radix sort.
  4. Tile ranges via two ``searchsorted`` calls.

Capacity is a static upper bound on total intersections; overflow is reported
(not silently dropped) via ``n_isects`` vs ``capacity``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians


class TileBins(NamedTuple):
    order: jnp.ndarray  # (N,) gaussian index by ascending depth (culled last)
    sorted_rank: jnp.ndarray  # (capacity,) rank (into depth-sorted arrays) per isect slot
    tile_start: jnp.ndarray  # (T,) first slot of each tile
    tile_cnt: jnp.ndarray  # (T,) number of isects of each tile
    n_isects: jnp.ndarray  # () total intersections actually generated
    capacity: int


def bin_gaussians(
    proj: ProjectedGaussians,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
) -> TileBins:
    depths = proj.depths
    N = depths.shape[0]
    num_tiles = tiles_x * tiles_y

    # 1. global depth sort (culled gaussians pushed to the end)
    depth_key = jnp.where(proj.mask, depths, jnp.inf)
    order = jnp.argsort(depth_key)  # stable ascending

    nt_sorted = proj.num_tiles_hit[order]  # (N,)
    bbox_sorted = proj.tile_bbox[order]  # (N, 4)

    cum = jnp.cumsum(nt_sorted) - nt_sorted  # exclusive cumsum
    total = cum[-1] + nt_sorted[-1]

    # 2. slot → (rank, tile) decode
    slots = jnp.arange(capacity, dtype=jnp.int32)
    rank = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32) - 1
    rank = jnp.clip(rank, 0, N - 1)
    valid = slots < jnp.minimum(total, capacity)
    k = slots - cum[rank]
    bb = bbox_sorted[rank]  # (capacity, 4)
    bw = jnp.maximum(bb[:, 2] - bb[:, 0], 1)
    tile = (bb[:, 1] + k // bw) * tiles_x + (bb[:, 0] + k % bw)
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)  # sentinel past-end

    # 3. stable sort by tile id; stability keeps depth order within a tile
    sorted_tile, sorted_rank = jax.lax.sort((tile, rank), num_keys=1, is_stable=True)

    # 4. per-tile ranges
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)

    return TileBins(
        order=order,
        sorted_rank=sorted_rank,
        tile_start=tile_start,
        tile_cnt=tile_end - tile_start,
        n_isects=total,
        capacity=capacity,
    )


def estimate_capacity(num_tiles_hit: jnp.ndarray, slack: float = 1.5, minimum: int = 1 << 14) -> int:
    """Host-side helper: pick a static intersection capacity with headroom.

    Call once outside jit (e.g. at scene load or after densify) and recompile
    only when the capacity bucket changes. Rounded up to a power of two so the
    number of distinct compiled shapes stays small.
    """
    total = int(jax.device_get(jnp.sum(num_tiles_hit)))
    cap = max(minimum, int(total * slack))
    return 1 << (cap - 1).bit_length()
