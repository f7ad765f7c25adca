"""Tile binning: global depth sort + Gaussian→tile intersection expansion.

TPU-native replacement for gsplat v0.1.2's CUDA binning stage
(``map_gaussian_to_intersects`` → radix sort by (tile, depth) →
``get_tile_bin_edges``; surfaced in the reference at
/root/reference/gaussctrl/gc_model.py:150-155,174-188 via ``num_tiles_hit`` /
``tile_bounds``).

Design notes (everything static-shape, and — measured on v5e — NO scatters and
NO searchsorted, both of which are order-of-magnitude slower than sorts/scans
on TPU; the only gathers allowed on hot paths are lane-axis gathers from
field-major arrays and small-index gathers):

  1. Sort all N Gaussians by camera depth once (``argsort``). *Rank* = index
     into depth-sorted arrays; per-tile depth order is inherited from ranks.
  2. Expand Gaussian→tile intersections: with ``cum`` the exclusive cumsum of
     per-Gaussian tile counts (rank order), each gaussian's rank is scattered…
     no — *marked* at its first slot via a tiny ``.at[].max`` and filled with a
     cummax scan; the k-th tile decodes from the tile bbox.
  3. One stable sort by tile id carrying (rank, slot) payloads reproduces the
     CUDA (tile, depth)-key radix sort; slot ids make the permutation
     invertible for the backward pass.
  4. Tile ranges via two small searchsorted calls (1 query per tile).
  5. The CHUNK-aligned re-layout used by the Pallas kernels is *virtual*: per
     chunk-of-128-slots metadata (owning tile, base offset) is derived by
     broadcast expansion, and the aligned→sorted-slot permutation is affine
     per tile — no materialized scatter.

Capacity is a static upper bound on total intersections; overflow is reported
(not silently dropped) via ``n_isects`` vs ``capacity``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians

ALIGN = 128  # chunk size of the Pallas blend stream (= blend_pallas.CHUNK)


class TileBins(NamedTuple):
    order: jnp.ndarray  # (N,) gaussian index by ascending depth (culled last)
    cum: jnp.ndarray  # (N,) exclusive cumsum of tile hits in rank order
    nt_sorted: jnp.ndarray  # (N,) tile hits in rank order
    sorted_rank: jnp.ndarray  # (capacity,) rank per tile-sorted slot
    sorted_slot: jnp.ndarray  # (capacity,) pre-sort slot id per tile-sorted slot
    sorted_tile: jnp.ndarray  # (capacity,) tile id per tile-sorted slot
    tile_start: jnp.ndarray  # (T,) first sorted slot of each tile
    tile_cnt: jnp.ndarray  # (T,) number of isects of each tile
    aligned_start: jnp.ndarray  # (T,) ALIGN-multiple starts of the virtual layout
    n_isects: jnp.ndarray  # () total intersections actually generated
    capacity: int
    aligned_capacity: int


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

    # 2. slot → (rank, tile) decode via mark + cummax (no searchsorted)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    ranks_at_start = jnp.zeros(capacity, jnp.int32).at[cum].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    rank = jax.lax.associative_scan(jnp.maximum, ranks_at_start)
    rank = jnp.clip(rank, 0, N - 1)
    valid = slots < jnp.minimum(total, capacity)
    k = slots - cum[rank]
    bb = bbox_sorted[rank]  # (capacity, 4) row gather, small source
    bw = jnp.maximum(bb[:, 2] - bb[:, 0], 1)
    tile = (bb[:, 1] + k // bw) * tiles_x + (bb[:, 0] + k % bw)
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)  # sentinel past-end

    # 3. stable sort by tile id; stability keeps depth order within a tile
    sorted_tile, sorted_rank, sorted_slot = jax.lax.sort(
        (tile, rank, slots), num_keys=1, is_stable=True
    )

    # 4. per-tile ranges (1024 queries — cheap)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    tile_cnt = tile_end - tile_start

    # 5. virtual ALIGN-padded layout
    aligned_capacity = _aligned_capacity(capacity, num_tiles)
    aligned_cnt = ((tile_cnt + ALIGN - 1) // ALIGN) * ALIGN
    aligned_start = (jnp.cumsum(aligned_cnt) - aligned_cnt).astype(jnp.int32)

    return TileBins(
        order=order,
        cum=cum,
        nt_sorted=nt_sorted,
        sorted_rank=sorted_rank,
        sorted_slot=sorted_slot,
        sorted_tile=sorted_tile,
        tile_start=tile_start,
        tile_cnt=tile_cnt,
        aligned_start=aligned_start,
        n_isects=total,
        capacity=capacity,
        aligned_capacity=aligned_capacity,
    )


def _aligned_capacity(capacity: int, num_tiles: int) -> int:
    return capacity + num_tiles * ALIGN


def estimate_capacity(num_tiles_hit: jnp.ndarray, slack: float = 1.5, minimum: int = 1 << 14) -> int:
    """Host-side helper: pick a static intersection capacity with headroom.

    Call once outside jit (e.g. at scene load or after densify) and recompile
    only when the capacity bucket changes. Rounded up to a power of two so the
    number of distinct compiled shapes stays small.
    """
    total = int(jax.device_get(jnp.sum(num_tiles_hit)))
    cap = max(minimum, int(total * slack))
    return 1 << (cap - 1).bit_length()
