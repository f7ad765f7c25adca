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
     per-gaussian payloads (tile hits, bit-packed bbox) in the sort itself.
     *Rank* = index into depth-sorted arrays; per-tile depth order is
     inherited from ranks.
  2. FIRST-TILE DIRECT EMISSION (round 5): every visible gaussian's k=0
     intersection enters the tile sort directly; only the k>=1 EXTRA tiles
     go through the expansion machinery, which therefore runs at
     ``extra_capacity ≈ capacity − N`` instead of full capacity (~3x fewer
     decode-gather queries at the post-densify operating point). The
     extra-slot→rank fill is a MERGE-SORT (marks at 2·cum_x interleaved
     with slots at 2s+1, cummax fill, extraction sort) instead of the old
     ``.at[].max`` scatter: the scatter costs ~9 ns/update × N while the
     two 2-row sorts cost ~0.5-0.9 ns/row-elem (scripts/bench_gather_law.py).
     Per-slot (bbox, cum_x) come from ONE fused 2-row small-table gather;
     the k-th tile decodes arithmetically.
  3. One sort of the combined (direct + extra) stream by the two keys
     (tile, rank) reproduces the CUDA (tile, depth)-key radix sort.
  4. Tile ranges via two searchsorted calls (1 query per tile).
  5. The CHUNK-aligned layout geometry (per-tile aligned starts, per-group
     SUPER padding) is pure per-tile arithmetic; per-chunk metadata
     (tile/base/count) comes from one tiny mark + cummax fill.
  6. ``aligned_gid`` — the ORIGINAL gaussian index occupying every aligned
     slot — is
     realized by a KEY-SORT over real+pad+group-pad entries (~0.55 ms at
     bear). An arithmetic alternative (one (2, capacity) lane gather at
     aligned_capacity queries) measured 2.06 ms: capacity-sized tables do
     not get VMEM residency, so big-query gathers stay latency-bound even
     at 1.4 MB tables — only ≤N-gaussian tables are the fast path. The
     blend kernels then need exactly one (NFIELD, aligned)←(NFIELD, N)
     small-table gather.
     ``aligned_gid`` is also the backward's reduction key: sorting the
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
    gid_end: jnp.ndarray  # (N,) inclusive segment end per ORIGINAL gaussian
    nt_orig: jnp.ndarray  # (N,) tile hits, orig order
    cum: jnp.ndarray  # (N,) exclusive cumsum of tile hits in rank order
    nt_sorted: jnp.ndarray  # (N,) tile hits in rank order
    sorted_rank: jnp.ndarray  # (stream_cap,) rank per tile-sorted slot
    tile_start: jnp.ndarray  # (T,) first tile-sorted slot of each tile
    tile_cnt: jnp.ndarray  # (T,) number of isects of each tile
    chunk_tile: jnp.ndarray  # (nc,) owning tile of each ALIGN-chunk
    chunk_base: jnp.ndarray  # (nc,) within-tile slot offset of each chunk
    chunk_cnt: jnp.ndarray  # (nc,) owning tile's isect count
    aligned_gid: jnp.ndarray  # (aligned_capacity,) gid per aligned slot (N = pad)
    n_isects: jnp.ndarray  # () total intersections actually generated
    n_extra: jnp.ndarray  # () k>=1 expansion slots actually needed
    n_aligned: jnp.ndarray  # () aligned slots actually needed (incl. padding)
    capacity: int
    extra_capacity: int  # static size of the k>=1 expansion stream
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
    extra_capacity = _extra_capacity(capacity, N)
    stream_cap = extra_capacity + N

    # 1. global depth sort (culled gaussians pushed to the end), CARRYING the
    # per-gaussian payloads in the sort itself: post-sort 1-D gathers
    # (`x[order]`) are per-query latency-bound on TPU (measured 3.3 ms for
    # 5 small arrays at N=300k vs 0.8 ms for the payload sort — sorts are
    # bandwidth-bound and cheap, random gathers are not). Payloads are SLIM:
    # the 4 bbox rows ride as 2 bit-packed int32 rows (x0|y0<<12, x1|y1<<12).
    depth_key = jnp.where(proj.mask, depths, jnp.inf)
    iota_n = jnp.arange(N, dtype=jnp.int32)
    bbp0 = proj.tile_bbox[:, 0] | (proj.tile_bbox[:, 1] << 12)
    bbp1 = proj.tile_bbox[:, 2] | (proj.tile_bbox[:, 3] << 12)
    _, order, nt_sorted, bbp0_r, bbp1_r = jax.lax.sort(
        (depth_key, iota_n, proj.num_tiles_hit, bbp0, bbp1),
        num_keys=1, is_stable=True,
    )
    cum = cumsum1d(nt_sorted) - nt_sorted  # exclusive cumsum (blocked scan)
    total = cum[-1] + nt_sorted[-1]
    # backward segment descriptors in ORIGINAL-gaussian (gid) order: the
    # aligned stream carries gids (not ranks), so the slot-grad sort groups
    # per ORIGINAL gaussian and segments tile [0, total) contiguously in gid
    # order — the end positions are the inclusive cumsum of nt_orig
    # (ASCENDING), the low boundary is the previous gaussian's end (a lane
    # shift), and no inverse-permutation sort or second boundary gather is
    # needed at all (round 5; formerly two random N-query gathers)
    nt_orig = jnp.where(proj.mask, proj.num_tiles_hit, 0).astype(jnp.int32)
    gid_end = jnp.clip(cumsum1d(nt_orig) - 1, 0, jnp.maximum(capacity - 1, 0))

    x0g = bbp0_r & 4095
    y0g = bbp0_r >> 12
    bw_r = jnp.maximum((bbp1_r & 4095) - x0g, 1)

    # 2. FIRST-TILE DIRECT EMISSION: every visible gaussian's k=0 intersection
    # enters the tile sort directly (no expansion machinery); the expansion
    # stream covers only the k>=1 EXTRA tiles (~30% of intersections at the
    # post-densify operating point the verdict targets), shrinking the decode
    # gather and the fill to extra_capacity instead of full capacity.
    nt_extra = jnp.maximum(nt_sorted - 1, 0)
    cum_x = cumsum1d(nt_extra) - nt_extra
    n_extra = cum_x[-1] + nt_extra[-1]

    # fused small-table row block, BIT-PACKED:
    # row0 = x0 | y0<<12; row1 = bw | cum_x<<bits_bw; row2 = gid (the
    # original gaussian index — streams downstream are gid-indexed so the
    # field pack needs no depth reorder and the backward needs no unsort)
    bits_bw = max(int(tiles_x).bit_length(), 1)  # bw ∈ [1, tiles_x]
    assert extra_capacity < (1 << (31 - bits_bw)), "capacity too large for packed cum"
    gtab = jnp.stack([bbp0_r, bw_r | (cum_x << bits_bw), order], axis=0)  # (3, N)

    # extra-slot → rank fill via MERGE-SORT instead of scatter+cummax: the
    # scatter costs ~9 ns/update × N (measured, scripts/bench_gather_law.py)
    # while two 2-row sorts over (N + extra_cap) cost ~0.5-0.9 ns/row-elem.
    # Marks (key 2·cum_x, payload rank) interleave with slots (key 2s+1);
    # after a cummax fill along the merged stream, a second sort keyed by
    # slot id extracts the per-slot fills in slot order. Zero-length marks
    # (nt_extra = 0, including culled) share their key with the next real
    # segment start and lose to it in the cummax (larger rank wins).
    slots_x = jnp.arange(extra_capacity, dtype=jnp.int32)
    mkeys = jnp.concatenate([cum_x * 2, slots_x * 2 + 1])
    mpay = jnp.concatenate([iota_n, jnp.zeros(extra_capacity, jnp.int32)])
    skeys, spay = jax.lax.sort((mkeys, mpay), num_keys=1, is_stable=True)
    fill = cummax1d(spay)
    iota_m = jnp.arange(skeys.shape[0], dtype=jnp.int32)
    ex_key = jnp.where((skeys & 1) == 1, skeys >> 1, extra_capacity + 1 + iota_m)
    _, fill_s = jax.lax.sort((ex_key, fill), num_keys=1, is_stable=True)
    rank_x = jnp.clip(fill_s[:extra_capacity], 0, N - 1)

    valid_x = slots_x < jnp.minimum(n_extra, extra_capacity)
    g2 = gtab[:, rank_x]  # (3, extra_cap) — ONE fast small-table gather
    x0 = g2[0] & 4095
    y0 = g2[0] >> 12
    gid_x = g2[2]
    bw = g2[1] & ((1 << bits_bw) - 1)
    k = slots_x - (g2[1] >> bits_bw) + 1  # k >= 1: tile 0 was emitted directly
    # k // bw as f32 floor((k+0.5)/bw): int32 division has no TPU fast path;
    # exact for k < 2^17, bw ≤ 256 (exhaustively verified, margin 0.5/bw ≫ ulp)
    ky = jnp.floor((k.astype(jnp.float32) + 0.5) / bw.astype(jnp.float32)).astype(jnp.int32)
    kx = k - ky * bw
    tile_x = (y0 + ky) * tiles_x + (x0 + kx)
    tile_x = jnp.where(valid_x, tile_x, num_tiles).astype(jnp.int32)

    # direct k=0 entries, rank order
    tile_d = jnp.where(nt_sorted > 0, y0g * tiles_x + x0g, num_tiles).astype(jnp.int32)

    # 3. sort the combined stream by (tile, rank): two sort keys replace the
    # old stability trick (direct and extra entries interleave, so input
    # order no longer encodes depth order); (tile, rank) pairs are unique.
    # gid rides as a payload — it indexes the original-order field table in
    # the blend (rank stays for the jnp oracle's depth-sorted gather).
    stream_tile = jnp.concatenate([tile_d, tile_x])
    stream_rank = jnp.concatenate([iota_n, rank_x])
    stream_gid = jnp.concatenate([order, gid_x])
    sorted_tile, sorted_rank, sorted_gid = jax.lax.sort(
        (stream_tile, stream_rank, stream_gid), num_keys=2
    )

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

    # 7. aligned_gid via KEY-SORT (measured: a (2, capacity)-table gather at
    # aligned_capacity queries costs 2.06 ms at bear — capacity-sized tables
    # do NOT get VMEM residency, so the 377k-entry sort at 0.55 ms wins):
    # per-sorted-slot pad offset δ = aligned_start − tile_start, monotone in
    # tile id → mark at tile_start, cummax fill (collisions resolve to the
    # owning non-empty tile, which has the largest id and largest δ)
    delta = aligned_start - tile_start  # (T,)
    slots = jnp.arange(stream_cap, dtype=jnp.int32)
    delta_fill = cummax1d(
        jnp.zeros(stream_cap, jnp.int32).at[tile_start].max(delta, mode="drop")
    )
    fwdmap = slots + delta_fill  # aligned position of each tile-sorted slot
    # entries with the past-end tile sentinel (invalid extras, culled direct
    # entries, expansion overflow) sorted behind every real tile
    sorted_valid = sorted_tile < num_tiles
    real_key = jnp.where(sorted_valid, fwdmap, _HUGE1 + slots)
    real_gid = jnp.where(sorted_valid, sorted_gid, N)

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
    all_gids = jnp.concatenate(
        [real_gid, jnp.full(pad_key.shape, N, jnp.int32), jnp.full(gpad_key.shape, N, jnp.int32)]
    )
    shortfall = aligned_capacity - all_keys.shape[0]  # static; >0 only for tiny grids
    if shortfall > 0:
        all_keys = jnp.concatenate(
            [all_keys, _HUGE2 + (1 << 22) + jnp.arange(shortfall, dtype=jnp.int32)]
        )
        all_gids = jnp.concatenate([all_gids, jnp.full(shortfall, N, jnp.int32)])
    _, aligned_gid = jax.lax.sort(
        (all_keys, all_gids), num_keys=1, is_stable=True
    )
    aligned_gid = aligned_gid[:aligned_capacity]  # gid per aligned slot, N = pad

    return TileBins(
        order=order,
        gid_end=gid_end,
        nt_orig=nt_orig,
        cum=cum,
        nt_sorted=nt_sorted,
        sorted_rank=sorted_rank,
        tile_start=tile_start,
        tile_cnt=tile_cnt,
        chunk_tile=chunk_tile,
        chunk_base=chunk_base,
        chunk_cnt=chunk_cnt,
        aligned_gid=aligned_gid,
        n_isects=total,
        n_extra=n_extra,
        n_aligned=(group_start[-1] + group_padded[-1]) * ALIGN,
        capacity=capacity,
        extra_capacity=extra_capacity,
        aligned_capacity=aligned_capacity,
    )


def _aligned_capacity(capacity: int, num_tiles: int) -> int:
    n_groups = (num_tiles + GROUP - 1) // GROUP
    cap = capacity + num_tiles * ALIGN + n_groups * (SUPER - 1) * ALIGN
    q = SUPER * ALIGN
    return (cap + q - 1) // q * q


def _extra_capacity(capacity: int, n_gaussians: int) -> int:
    """Static size of the k>=1 expansion stream (first-tile direct emission).

    ``capacity`` budgets TOTAL intersections with slack; the extras need
    ``total − n_visible`` slots, for which ``capacity − N`` is the natural
    static scale (n_visible ≤ N). Floored for degenerate scenes (many culled
    gaussians but multi-tile survivors: capacity − N can undershoot — the
    overflow is REPORTED via ``n_extra`` vs ``extra_capacity`` and the
    trainer re-buckets, same contract as ``n_isects`` vs ``capacity``)."""
    g = 1 << 13  # finer than the main bucket: small scenes (bear ~37k
    # isects) pay stream-length costs for every unused slot here
    cap = max(capacity - n_gaussians, capacity // 8, g)
    return (cap + g - 1) // g * g


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
