"""Tile binning: global depth sort + Gaussian→tile intersection expansion.

TPU-native replacement for gsplat v0.1.2's CUDA binning stage
(``map_gaussian_to_intersects`` → radix sort by (tile, depth) →
``get_tile_bin_edges``; surfaced in the reference at
/root/reference/gaussctrl/gc_model.py:150-155,174-188 via ``num_tiles_hit`` /
``tile_bounds``).

Design notes — everything static-shape, and shaped by costs MEASURED on this
v5e (slope-timed, tunnel overhead subtracted):

  * ``jax.lax.sort`` is nearly free: 262k keys + 8 f32 payloads ≈ 0.23 ms.
  * lane gathers are fast ONLY from tables that fit VMEM (≤ ~8 MB): a
    (16, 393k)←(16, 35k) gather is 0.6 ms, ←(16, 262k) is 3.9 ms.
  * 1-row / 1-D gathers are pathological (~2.8 ms) regardless of table size.
  * scatters other than tiny ``.at[].max`` marks are avoided entirely.

Therefore every permutation here is a SORT (payload-carrying, so no
post-sort gathers), and gathers read small (≤ N-gaussian) tables — with one
deliberate exception: the blend backward's segment-boundary lookup does a
single wide gather from the capacity-sized prefix table (see
blend_pallas._blend_core_bwd), because one wide gather measured cheaper than
two narrow ones plus an unsort gather:

  1. Sort all N Gaussians by camera depth with ``lax.sort`` CARRYING the
     per-gaussian payloads (tile hits, bbox) in the sort itself. *Rank* =
     index into depth-sorted arrays; per-tile depth order is inherited from
     ranks.
  2. Expand Gaussian→tile intersections over ``capacity`` slots: each
     gaussian's rank is marked at its first slot (``.at[].max``) and filled
     with a cummax scan; per-slot (bbox, cum) come from ONE fused 4-row
     small-table gather; the k-th tile decodes arithmetically.
  3. One stable sort by tile id carrying ranks reproduces the CUDA
     (tile, depth)-key radix sort.
  4. Tile ranges via two searchsorted calls (1 query per tile).
  5. The CHUNK-aligned layout geometry (per-tile aligned starts, per-group
     SUPER padding) is pure per-tile arithmetic; per-chunk metadata
     (tile/base/count) comes from one tiny mark + cummax fill.
  6. ``aligned_rank`` — the gaussian rank occupying every aligned slot — is
     realized by a KEY-SORT over real+pad+group-pad entries (~0.55 ms at
     bear). An arithmetic alternative (one (2, capacity) lane gather at
     aligned_capacity queries) measured 2.06 ms: capacity-sized tables do
     not get VMEM residency, so big-query gathers stay latency-bound even
     at 1.4 MB tables — only ≤N-gaussian tables are the fast path. The
     blend kernels then need exactly one (NFIELD, aligned)←(NFIELD, N)
     small-table gather.
     ``aligned_rank`` is also the backward's reduction key: sorting the
     per-slot gradient stream by it groups slots per gaussian with segment
     boundaries at ``cum`` (pre-sort slot order), scatter-free.

Capacity is a static upper bound on total intersections; overflow is reported
(not silently dropped) via ``n_isects`` vs ``capacity``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians
from .scan2d import cummax1d, cumsum1d

ALIGN = 128  # chunk size of the Pallas blend stream (= blend_pallas.CHUNK)
GROUP = 8  # tiles per blend-kernel output block (shared VMEM residency)
SUPER = 4  # chunks per blend-kernel grid step (DMA/step-overhead amortization)
_HUGE1 = 1 << 26  # sort-to-end key for invalid real slots
_HUGE2 = 1 << 27  # sort-to-end key for unused pad entries


class TileBins(NamedTuple):
    order: jnp.ndarray  # (N,) gaussian index by ascending depth (culled last)
    inv_order: jnp.ndarray  # (N,) depth rank of each gaussian (inverse of order)
    hi_orig: jnp.ndarray  # (N,) last slot of each gaussian's segment, orig order
    cum_orig: jnp.ndarray  # (N,) exclusive segment start, orig order
    nt_orig: jnp.ndarray  # (N,) tile hits, orig order
    cum: jnp.ndarray  # (N,) exclusive cumsum of tile hits in rank order
    nt_sorted: jnp.ndarray  # (N,) tile hits in rank order
    sorted_rank: jnp.ndarray  # (capacity,) rank per tile-sorted slot
    tile_start: jnp.ndarray  # (T,) first tile-sorted slot of each tile
    tile_cnt: jnp.ndarray  # (T,) number of isects of each tile
    chunk_tile: jnp.ndarray  # (nc,) owning tile of each ALIGN-chunk
    chunk_base: jnp.ndarray  # (nc,) within-tile slot offset of each chunk
    chunk_cnt: jnp.ndarray  # (nc,) owning tile's isect count
    aligned_rank: jnp.ndarray  # (aligned_capacity,) rank per aligned slot (N = pad)
    n_isects: jnp.ndarray  # () total intersections actually generated
    n_aligned: jnp.ndarray  # () aligned slots actually needed (incl. padding)
    capacity: int
    aligned_capacity: int


def bin_gaussians(
    proj: ProjectedGaussians,
    tiles_x: int,
    tiles_y: int,
    capacity: int,
    aligned_capacity: int | None = None,
) -> TileBins:
    """``aligned_capacity``: optional static size of the CHUNK-aligned stream.
    Defaults to the data-independent worst case ``_aligned_capacity`` (never
    overflows). A host-measured tighter bound (``estimate_aligned_capacity``)
    cuts the pad slack the sorts/kernels stream over by ~25% at bear scale;
    overflow is then possible and REPORTED via ``n_aligned`` vs
    ``aligned_capacity`` (same contract as ``n_isects`` vs ``capacity`` —
    the trainer re-buckets, nothing silently truncates unmonitored)."""
    depths = proj.depths
    N = depths.shape[0]
    num_tiles = tiles_x * tiles_y

    # 1. global depth sort (culled gaussians pushed to the end), CARRYING the
    # per-gaussian payloads in the sort itself: post-sort 1-D gathers
    # (`x[order]`) are per-query latency-bound on TPU (measured 3.3 ms for
    # 5 small arrays at N=300k vs 0.8 ms for the payload sort — sorts are
    # bandwidth-bound and cheap, random gathers are not).
    depth_key = jnp.where(proj.mask, depths, jnp.inf)
    iota_n = jnp.arange(N, dtype=jnp.int32)
    _, order, nt_sorted, bb0, bb1, bb2, bb3 = jax.lax.sort(
        (depth_key, iota_n, proj.num_tiles_hit, proj.tile_bbox[:, 0],
         proj.tile_bbox[:, 1], proj.tile_bbox[:, 2], proj.tile_bbox[:, 3]),
        num_keys=1, is_stable=True,
    )
    cum = cumsum1d(nt_sorted) - nt_sorted  # exclusive cumsum (blocked scan)
    total = cum[-1] + nt_sorted[-1]
    # inverse permutation (gaussian → depth rank) CARRYING the blend
    # backward's segment descriptors (hi slot, exclusive start, count) into
    # original-gaussian order: the backward then does exactly two N-query
    # gathers from its prefix table and no unsort (gathers are per-QUERY
    # latency-bound — ~4.5 ns/query regardless of row width — so shaving
    # query count is the only lever that moves them)
    hi_idx = jnp.clip(cum + nt_sorted - 1, 0, jnp.maximum(capacity - 1, 0))
    _, inv_order, hi_orig, cum_orig, nt_orig = jax.lax.sort(
        (order, iota_n, hi_idx, cum, nt_sorted), num_keys=1
    )

    # fused small-table row block, BIT-PACKED to 2 rows (halves the gather):
    # row0 = x0 | y0<<12; row1 = bw | cum<<bits_bw
    bb_r = jnp.stack([bb0, bb1, bb2, bb3], axis=1)  # (N, 4), depth order
    bits_bw = max(int(tiles_x).bit_length(), 1)  # bw ∈ [1, tiles_x]
    assert capacity < (1 << (31 - bits_bw)), "capacity too large for packed cum"
    bw_r = jnp.maximum(bb_r[:, 2] - bb_r[:, 0], 1)
    gtab = jnp.stack(
        [bb_r[:, 0] | (bb_r[:, 1] << 12), bw_r | (cum << bits_bw)], axis=0
    )  # (2, N) int32

    # 2. slot → (rank, tile) decode via mark + cummax (no searchsorted)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    ranks_at_start = jnp.zeros(capacity, jnp.int32).at[cum].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    rank = cummax1d(ranks_at_start)
    rank = jnp.clip(rank, 0, N - 1)
    valid = slots < jnp.minimum(total, capacity)
    g2 = gtab[:, rank]  # (2, capacity) — ONE fast small-table gather
    x0 = g2[0] & 4095
    y0 = g2[0] >> 12
    bw = g2[1] & ((1 << bits_bw) - 1)
    k = slots - (g2[1] >> bits_bw)
    # k // bw as f32 floor((k+0.5)/bw): int32 division has no TPU fast path;
    # exact for k < 2^17, bw ≤ 256 (exhaustively verified, margin 0.5/bw ≫ ulp)
    ky = jnp.floor((k.astype(jnp.float32) + 0.5) / bw.astype(jnp.float32)).astype(jnp.int32)
    kx = k - ky * bw
    tile = (y0 + ky) * tiles_x + (x0 + kx)
    tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)  # sentinel past-end

    # 3. stable sort by tile id; stability keeps depth order within a tile
    sorted_tile, sorted_rank = jax.lax.sort((tile, rank), num_keys=1, is_stable=True)

    # 4. per-tile ranges (1024 queries — cheap)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
    tile_cnt = tile_end - tile_start

    # 5. ALIGN-padded, GROUP/SUPER-structured layout via KEY-SORT (no
    # big-table gathers anywhere). Layout invariants the blend kernels rely
    # on: each ALIGN-chunk holds slots of ONE tile in depth order; chunks of
    # one tile are consecutive; tiles of one GROUP are consecutive; each
    # group's chunk count is padded to a multiple of SUPER so a grid step
    # (SUPER chunks) never crosses a group boundary.
    if aligned_capacity is None:
        aligned_capacity = _aligned_capacity(capacity, num_tiles)
    assert aligned_capacity % (SUPER * ALIGN) == 0, "aligned_capacity granularity"
    n_groups = (num_tiles + GROUP - 1) // GROUP
    aligned_cnt = ((tile_cnt + ALIGN - 1) // ALIGN) * ALIGN
    chunks_t = aligned_cnt // ALIGN  # (T,)
    tpad = n_groups * GROUP - num_tiles
    gch = jnp.pad(chunks_t, (0, tpad)).reshape(n_groups, GROUP)
    group_chunks = gch.sum(axis=1)  # (n_groups,)
    group_padded = ((group_chunks + SUPER - 1) // SUPER) * SUPER
    group_start = jnp.cumsum(group_padded) - group_padded  # in chunks
    within = jnp.cumsum(gch, axis=1) - gch  # per-tile offset inside group
    aligned_start = (
        ((group_start[:, None] + within).reshape(-1)[:num_tiles]) * ALIGN
    ).astype(jnp.int32)

    # 6. per-chunk metadata (tile, base offset, count)
    nc = aligned_capacity // ALIGN
    cids = jnp.arange(nc, dtype=jnp.int32)
    marks = jnp.zeros(nc, jnp.int32).at[aligned_start // ALIGN].max(tids, mode="drop")
    chunk_tile = cummax1d(marks)
    chunk_base = cids * ALIGN - aligned_start[chunk_tile]  # small gathers (nc from T)
    chunk_cnt = tile_cnt[chunk_tile]

    # 7. aligned_rank via KEY-SORT (measured: a (2, capacity)-table gather at
    # aligned_capacity queries costs 2.06 ms at bear — capacity-sized tables
    # do NOT get VMEM residency, so the 377k-entry sort at 0.55 ms wins):
    # per-sorted-slot pad offset δ = aligned_start − tile_start, monotone in
    # tile id → mark at tile_start, cummax fill (collisions resolve to the
    # owning non-empty tile, which has the largest id and largest δ)
    delta = aligned_start - tile_start  # (T,)
    delta_fill = cummax1d(
        jnp.zeros(capacity, jnp.int32).at[tile_start].max(delta, mode="drop")
    )
    fwdmap = slots + delta_fill  # aligned position of each tile-sorted slot
    sorted_valid = slots < jnp.minimum(total, capacity)
    real_key = jnp.where(sorted_valid, fwdmap, _HUGE1 + slots)
    real_rank = jnp.where(sorted_valid, sorted_rank, N)

    # 128 potential pad entries per tile; the first (aligned_cnt − cnt) land
    # in the tail of the tile's last chunk, the rest sort past everything
    j = jnp.arange(ALIGN, dtype=jnp.int32)[None, :]  # (1, 128)
    padcnt = (aligned_cnt - tile_cnt)[:, None]  # (T, 1)
    pad_key = jnp.where(
        j < padcnt,
        (aligned_start + tile_cnt)[:, None] + j,
        _HUGE2 + tids[:, None] * ALIGN + j,
    ).reshape(-1)
    # SUPER·128 potential pad entries per GROUP; the first
    # (group_padded − group_chunks)·128 fill the group's whole-chunk pads,
    # the rest sort past everything (the extra width also guarantees enough
    # entries to fill the static aligned_capacity when it exceeds the need)
    jg = jnp.arange(SUPER * ALIGN, dtype=jnp.int32)[None, :]
    gpadcnt = ((group_padded - group_chunks) * ALIGN)[:, None]  # (n_groups, 1)
    gids = jnp.arange(n_groups, dtype=jnp.int32)[:, None]
    gpad_key = jnp.where(
        jg < gpadcnt,
        ((group_start + group_chunks) * ALIGN)[:, None] + jg,
        _HUGE2 + (num_tiles + gids) * (SUPER * ALIGN) + jg,
    ).reshape(-1)
    all_keys = jnp.concatenate([real_key, pad_key, gpad_key])
    all_ranks = jnp.concatenate(
        [real_rank, jnp.full(pad_key.shape, N, jnp.int32), jnp.full(gpad_key.shape, N, jnp.int32)]
    )
    shortfall = aligned_capacity - all_keys.shape[0]  # static; >0 only for tiny grids
    if shortfall > 0:
        all_keys = jnp.concatenate(
            [all_keys, _HUGE2 + (1 << 22) + jnp.arange(shortfall, dtype=jnp.int32)]
        )
        all_ranks = jnp.concatenate([all_ranks, jnp.full(shortfall, N, jnp.int32)])
    _, aligned_rank = jax.lax.sort(
        (all_keys, all_ranks), num_keys=1, is_stable=True
    )
    aligned_rank = aligned_rank[:aligned_capacity]  # rank per aligned slot, N = pad

    return TileBins(
        order=order,
        inv_order=inv_order,
        hi_orig=hi_orig,
        cum_orig=cum_orig,
        nt_orig=nt_orig,
        cum=cum,
        nt_sorted=nt_sorted,
        sorted_rank=sorted_rank,
        tile_start=tile_start,
        tile_cnt=tile_cnt,
        chunk_tile=chunk_tile,
        chunk_base=chunk_base,
        chunk_cnt=chunk_cnt,
        aligned_rank=aligned_rank,
        n_isects=total,
        n_aligned=(group_start[-1] + group_padded[-1]) * ALIGN,
        capacity=capacity,
        aligned_capacity=aligned_capacity,
    )


def _aligned_capacity(capacity: int, num_tiles: int) -> int:
    n_groups = (num_tiles + GROUP - 1) // GROUP
    cap = capacity + num_tiles * ALIGN + n_groups * (SUPER - 1) * ALIGN
    q = SUPER * ALIGN
    return (cap + q - 1) // q * q


def round_capacity(total_isects: int, slack: float = 1.5, minimum: int = 1 << 14) -> int:
    """Static intersection capacity for a measured/estimated isect total.

    Rounded up to a multiple of 16384 (the sort/scan/gather costs scale
    linearly with capacity, so pow-2-only rounding wastes up to 2× device
    time; 16 Ki granularity keeps the number of distinct compiled shapes
    small enough)."""
    cap = max(minimum, int(total_isects * slack))
    g = 1 << 14
    return (cap + g - 1) // g * g


def estimate_aligned_capacity(
    proj: ProjectedGaussians, tiles_x: int, tiles_y: int, capacity: int,
    slack: float = 1.15,
) -> int:
    """Host-side: measure the aligned-slot need of THIS scene/camera and pick
    a static aligned capacity with headroom (multiple of SUPER·ALIGN).

    The data-independent worst case pads every tile by up to a full chunk
    (~40% slack at bear scale); one measured binning pass cuts that to
    ``slack``. Per-step drift is small (tile occupancy changes slowly), and
    overflow is reported via ``TileBins.n_aligned`` for re-bucketing."""
    bins = jax.jit(bin_gaussians, static_argnums=(1, 2, 3))(
        proj, tiles_x, tiles_y, capacity
    )
    need = int(jax.device_get(bins.n_aligned))
    q = SUPER * ALIGN
    cap = int(need * slack)
    cap = (cap + q - 1) // q * q
    return min(cap, _aligned_capacity(capacity, tiles_x * tiles_y))


def estimate_capacity(num_tiles_hit: jnp.ndarray, slack: float = 1.5, minimum: int = 1 << 14) -> int:
    """Host-side helper: pick a static intersection capacity with headroom.

    Call once outside jit (e.g. at scene load or after densify) and recompile
    only when the capacity bucket changes; the trainer's auto-rebucketing
    (engine/trainer.py) does exactly that when ``n_isects`` approaches the
    bucket."""
    total = int(jax.device_get(jnp.sum(num_tiles_hit)))
    return round_capacity(total, slack, minimum)
