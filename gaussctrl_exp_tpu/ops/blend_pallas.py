"""Pallas TPU kernels for tile rasterization (forward + custom VJP).

TPU-native replacement for gsplat v0.1.2's ``rasterize_gaussians`` CUDA
kernels (the hot fwd/bwd pair behind /root/reference/gaussctrl/gc_model.py:208-236).
The CUDA design is a serial per-pixel loop over depth-sorted gaussians with
atomics in the backward; on TPU the same math is re-derived as dense streaming
algebra shaped by measured v5e costs (sorts/scans/lane-gathers fast; scatters,
row/column gathers and searchsorted slow):

  * binning (ops/binning.py) provides depth-sorted per-tile slot lists, a
    *virtual* CHUNK-aligned layout (per-tile starts rounded to 128), per-chunk
    metadata, and the two FUSED gather index maps — so the kernels here do
    exactly one field-major lane gather into the aligned stream (fwd) and one
    back out of it (bwd), and no permutation algebra is recomputed;
  * the kernel GRID ITERATES OVER CHUNKS of the aligned stream — Pallas
    auto-pipelines the (NFIELD × CHUNK) blocks (no manual DMA/semaphores);
    consecutive chunks of one tile revisit the same output block, which stays
    resident in VMEM (standard reduction pattern);
  * padding chunks (static capacity slack) and chunks of tiles whose 256
    pixels have ALL hit the transmittance floor are SKIPPED via ``pl.when`` —
    the capacity tail costs only its block DMA, and the CUDA early-exit
    ``break`` saves real work on dense tiles, not just a mask;
  * alphas for 256 pixels × 128 gaussians are one VPU block; the exclusive
    cumulative transmittance along the gaussian axis is ``exp(L @ U)`` with U
    strictly-upper-triangular ones — an MXU matmul — with per-pixel carry
    (T, done) in the output block's spare channels;
  * the per-element early-termination (T ≤ 1e-4) is the monotone mask
    ``T_after > 1e-4`` + carried done flag (exact break parity, no control
    flow).

The backward pass is a SINGLE FORWARD SWEEP (not a reverse replay): with
residuals ``img`` and ``final_T``, the suffix sums the gradient needs satisfy
``suffix_u = img·g − prefix_u``, so one walk over the same chunk stream emits
dL/d{xy, conic, color, opacity} per intersection slot as its own chunk-indexed
output block — contiguous, race-free, no atomics. Slot gradients are reduced
to per-gaussian gradients with ONE lane gather (via the precomputed
aligned→pre-sort map) + a segmented cumsum-difference (slots of one gaussian
are contiguous in pre-sort order), again scatter-free.

ops/blend.py is the differentiable jnp oracle; tests compare both paths in
interpret mode and on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import GROUP, SUPER, TileBins
from .scan2d import cumsum_rows
from .blend import ALPHA_CLAMP, MIN_ALPHA, T_EPS, BlendOutputs
from .projection import BLOCK

CHUNK = 128  # gaussians per chunk (MXU-aligned; == binning.ALIGN)
NFIELD = 16  # packed field rows: x y ca cb cc opac c0..c3 (+pad)
P = BLOCK * BLOCK  # 256 pixels per tile
GP = GROUP * P  # pixels per output block (GROUP tiles resident together)


def _pack_fields(xys, conics, colors, opacs) -> jnp.ndarray:
    """Per-gaussian data (N, ·) → (6+C, N) field-major array (live rows only;
    the NFIELD pad happens AFTER the aligned expand gather — gathering dead
    rows costs 7/16 of the dominant gather, ~1.7 ms at garden scale)."""
    C = colors.shape[1]
    assert C <= 8, "at most 8 blend channels"
    rows = [
        xys[:, 0],
        xys[:, 1],
        conics[:, 0],
        conics[:, 1],
        conics[:, 2],
        opacs,
    ] + [colors[:, i] for i in range(C)]
    return jnp.stack(rows, axis=0)  # (6+C, N)


def _pixel_coords(t, tiles_x):
    """Tile id scalar → (P, 1) f32 pixel x/y coordinate columns."""
    ty = (t // tiles_x).astype(jnp.float32)
    tx = jax.lax.rem(t, tiles_x).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    py = (pix // BLOCK).astype(jnp.float32) + ty * BLOCK
    px = jax.lax.rem(pix, BLOCK).astype(jnp.float32) + tx * BLOCK
    return px, py


def _triu_strict():
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r < c).astype(jnp.float32)


def _chunk_alphas(g, px, py, base, cnt):
    """Alpha computation for one (NFIELD, CHUNK) chunk against 256 pixels."""
    gx, gy = g[0:1, :], g[1:2, :]
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    op = g[5:6, :]
    dx = gx - px  # (P, CHUNK)
    dy = gy - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + base
    valid = slot < cnt
    vis = jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_CLAMP, op * vis)
    ok = valid & (sigma >= 0.0) & (alpha >= MIN_ALPHA)
    aeff = jnp.where(ok, alpha, 0.0)
    one_minus = 1.0 - aeff
    L = jnp.log1p(-aeff)
    return aeff, one_minus, L, dx, dy, ca, cb, cc, op, vis


def _fwd_kernel(chunk_tile, chunk_base, chunk_cnt, g_ref, out_ref, done_s, *, tiles_x, n_chan):
    """One SUPER-step (SUPER chunks) against its GROUP's 8×256 pixels.

    out block (1, GP, 16): GROUP tile rows of 256 pixels; per tile row,
    cols [0:n_chan) composited image, col 7 final_T, col 8 done flag.
    Revisited by consecutive supersteps of the same group (binning pads each
    group's chunk count to a multiple of SUPER, so a step never crosses a
    group). Group-first detection = the previous superstep's tile belongs to
    a different group. Padding chunks (base ≥ cnt) and fully-done tiles skip
    compute; per-tile all-pixels-done flags live in SMEM (done_s, (GROUP,)).
    """
    s = pl.program_id(0)
    c0 = s * SUPER
    g0 = chunk_tile[c0] // GROUP
    prev_g = chunk_tile[jnp.maximum(c0 - SUPER, 0)] // GROUP

    @pl.when((s == 0) | (prev_g != g0))
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, (GP, 16), 1)
        out_ref[0] = jnp.where(col == 7, 1.0, 0.0)  # img=0, T=1, done=0
        for r in range(GROUP):
            done_s[r] = 0

    for sub in range(SUPER):
        c = c0 + sub
        t = chunk_tile[c]
        base = chunk_base[c]
        cnt = chunk_cnt[c]
        row = t - g0 * GROUP

        @pl.when((base < cnt) & (done_s[row] == 0))
        def _(sub=sub, t=t, base=base, cnt=cnt, row=row):
            px, py = _pixel_coords(t, tiles_x)
            g = g_ref[:, sub * CHUNK : (sub + 1) * CHUNK]  # (NFIELD, CHUNK)
            aeff, one_minus, L, *_ = _chunk_alphas(g, px, py, base, cnt)

            ro = pl.ds(row * P, P)
            T_carry = out_ref[0, ro, 7:8]
            done = out_ref[0, ro, 8:9] > 0.0

            cum_excl = jnp.dot(L, _triu_strict(), preferred_element_type=jnp.float32)
            T_excl = T_carry * jnp.exp(cum_excl)  # (P, CHUNK)
            T_after = T_excl * one_minus
            comp = (T_after > T_EPS) & (aeff > 0.0) & jnp.logical_not(done)
            w = jnp.where(comp, aeff * T_excl, 0.0)

            colors = g[6 : 6 + n_chan, :]  # (C, CHUNK)
            contrib = jax.lax.dot_general(
                w, colors, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # (P, C)
            out_ref[0, ro, 0:n_chan] = out_ref[0, ro, 0:n_chan] + contrib

            T_new = jnp.min(jnp.where(comp, T_after, T_carry), axis=1, keepdims=True)
            broke = jnp.min(jnp.where(aeff > 0.0, T_after, 1.0), axis=1, keepdims=True) <= T_EPS
            done_new = jnp.where(done | broke, 1.0, 0.0)
            out_ref[0, ro, 7:8] = T_new
            out_ref[0, ro, 8:9] = done_new
            done_s[row] = (jnp.min(done_new) > 0.0).astype(jnp.int32)


def _bwd_kernel(
    chunk_tile,
    chunk_base,
    chunk_cnt,
    g_ref,
    res_ref,
    gout_ref,
    sg_ref,
    state,
    done_s,
    *,
    tiles_x,
    n_chan,
):
    """Backward sweep over the same superstep stream: per-slot gradients.

    res_ref/gout_ref: (1, GP, 16) forward residual / cotangent blocks of this
    superstep's GROUP. sg_ref: (NFIELD, SUPER·CHUNK) output block — every
    superstep writes its own block (no gaps, no races). state: (GP, 8) VMEM
    scratch persisting across grid steps, one (P, 8) band per tile row:
    col 0 T_carry, col 1 done, col 2 prefix_u.
    """
    s = pl.program_id(0)
    c0 = s * SUPER
    g0 = chunk_tile[c0] // GROUP
    prev_g = chunk_tile[jnp.maximum(c0 - SUPER, 0)] // GROUP

    @pl.when((s == 0) | (prev_g != g0))
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, (GP, 8), 1)
        state[:, :] = jnp.where(col == 0, 1.0, 0.0)  # T=1, done=0, prefix_u=0
        for r in range(GROUP):
            done_s[r] = 0

    for sub in range(SUPER):
        c = c0 + sub
        t = chunk_tile[c]
        base = chunk_base[c]
        cnt = chunk_cnt[c]
        row = t - g0 * GROUP
        work = (base < cnt) & (done_s[row] == 0)
        so = pl.ds(sub * CHUNK, CHUNK)

        @pl.when(jnp.logical_not(work))
        def _(so=so):
            sg_ref[:, so] = jnp.zeros((NFIELD, CHUNK), jnp.float32)

        @pl.when(work)
        def _(sub=sub, t=t, base=base, cnt=cnt, row=row, so=so):
            px, py = _pixel_coords(t, tiles_x)
            tri = _triu_strict()
            g = g_ref[:, so]
            aeff, one_minus, L, dx, dy, ca, cb, cc, op, vis = _chunk_alphas(g, px, py, base, cnt)

            ro = pl.ds(row * P, P)
            res = res_ref[0, ro, :]  # (P, 16)
            img = res[:, :n_chan]
            T_final = res[:, 7:8]
            gout = gout_ref[0, ro, :]
            g_img = gout[:, :n_chan]
            g_T = gout[:, 7:8]
            img_dot_g = jnp.sum(img * g_img, axis=1, keepdims=True)  # (P, 1)
            gT_Tfinal = g_T * T_final

            T_carry = state[ro, 0:1]
            done = state[ro, 1:2] > 0.0
            prefix_u = state[ro, 2:3]

            cum_excl = jnp.dot(L, tri, preferred_element_type=jnp.float32)
            T_excl = T_carry * jnp.exp(cum_excl)
            T_after = T_excl * one_minus
            comp = (T_after > T_EPS) & (aeff > 0.0) & jnp.logical_not(done)
            compf = comp.astype(jnp.float32)
            w = aeff * T_excl * compf

            colors = g[6 : 6 + n_chan, :]  # (C, CHUNK)
            cg = jnp.dot(g_img, colors, preferred_element_type=jnp.float32)  # (P, CHUNK)
            u = w * cg
            tri_incl = tri + jnp.eye(CHUNK, dtype=jnp.float32)
            prefix_incl = prefix_u + jnp.dot(u, tri_incl, preferred_element_type=jnp.float32)
            suffix = img_dot_g - prefix_incl  # Σ_{k>j} u_k (within + later chunks)

            dalpha = compf * (T_excl * cg - (suffix + gT_Tfinal) / one_minus)
            dsigma = -(op * vis) * dalpha  # gsplat: no gating on the 0.999 clamp
            dopac = vis * dalpha

            gdx = dsigma * (ca * dx + cb * dy)
            gdy = dsigma * (cb * dx + cc * dy)
            # color grads transposed: dC[c', k] = Σ_p g_img[p,c']·w[p,k]  (C, CHUNK)
            dcolT = jax.lax.dot_general(
                g_img, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )

            sg_ref[0:1, so] = jnp.sum(gdx, axis=0, keepdims=True)
            sg_ref[1:2, so] = jnp.sum(gdy, axis=0, keepdims=True)
            sg_ref[2:3, so] = jnp.sum(dsigma * 0.5 * dx * dx, axis=0, keepdims=True)
            sg_ref[3:4, so] = jnp.sum(dsigma * dx * dy, axis=0, keepdims=True)
            sg_ref[4:5, so] = jnp.sum(dsigma * 0.5 * dy * dy, axis=0, keepdims=True)
            sg_ref[5:6, so] = jnp.sum(dopac, axis=0, keepdims=True)
            sg_ref[6 : 6 + n_chan, so] = dcolT
            sg_ref[6 + n_chan :, so] = jnp.zeros((NFIELD - 6 - n_chan, CHUNK), jnp.float32)

            T_new = jnp.min(jnp.where(comp, T_after, T_carry), axis=1, keepdims=True)
            broke = jnp.min(jnp.where(aeff > 0.0, T_after, 1.0), axis=1, keepdims=True) <= T_EPS
            done_new = jnp.where(done | broke, 1.0, 0.0)
            state[ro, 0:1] = T_new
            state[ro, 1:2] = done_new
            state[ro, 2:3] = prefix_u + jnp.sum(u, axis=1, keepdims=True)
            done_s[row] = (jnp.min(done_new) > 0.0).astype(jnp.int32)


def _tiles_to_image(out_groups, tiles_y, tiles_x, H, W, n_chan, tile_cnt):
    # group blocks (n_groups, GP, 16) → per-tile (num_tiles, P, 16); groups
    # are contiguous runs of GROUP tiles so this is a pure reshape
    out_tiles = out_groups.reshape(-1, P, 16)[: tiles_y * tiles_x]
    img = out_tiles[:, :, :n_chan].reshape(tiles_y, tiles_x, BLOCK, BLOCK, n_chan)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * BLOCK, tiles_x * BLOCK, n_chan)
    T = out_tiles[:, :, 7].reshape(tiles_y, tiles_x, BLOCK, BLOCK)
    T = T.transpose(0, 2, 1, 3).reshape(tiles_y * BLOCK, tiles_x * BLOCK)
    # tiles with zero chunks were never visited (their blocks hold garbage):
    # force img=0, T=1 — masked in IMAGE layout (128-lane minor dim); doing
    # this on the (·, P, 16) tile layout cost ~0.8 ms of 16-lane selects and
    # layout copies in the op profile. (These selects run only inside
    # _blend_core's custom_vjp forward, whose internals are never
    # differentiated — the bwd consumes cotangents directly — so a plain
    # where carries no backward cost.)
    empty = jnp.broadcast_to(
        (tile_cnt == 0).reshape(tiles_y, 1, tiles_x, 1),
        (tiles_y, BLOCK, tiles_x, BLOCK),
    ).reshape(tiles_y * BLOCK, tiles_x * BLOCK)
    img = jnp.where(empty[..., None], 0.0, img)
    T = jnp.where(empty, 1.0, T)
    return img[:H, :W], T[:H, :W]


def _image_to_tiles(img, finalT, tiles_y, tiles_x, n_chan):
    """Cotangent image → (n_groups, GP, 8) tile blocks: cols [0:n_chan) are
    d/d(img), col 7 is d/d(final_T). 8-wide (not 16): the bwd kernel reads
    only those columns, and the 16-wide concat measured 2× the assembly
    cost on the 16-lane minor layout."""
    H, W = finalT.shape
    pad_h, pad_w = tiles_y * BLOCK - H, tiles_x * BLOCK - W
    img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    finalT = jnp.pad(finalT, ((0, pad_h), (0, pad_w)))
    img = img.reshape(tiles_y, BLOCK, tiles_x, BLOCK, n_chan).transpose(0, 2, 1, 3, 4)
    img = img.reshape(tiles_y * tiles_x, P, n_chan)
    finalT = finalT.reshape(tiles_y, BLOCK, tiles_x, BLOCK).transpose(0, 2, 1, 3)
    finalT = finalT.reshape(tiles_y * tiles_x, P)
    packed = jnp.concatenate(
        [img, jnp.zeros((img.shape[0], P, 7 - n_chan)), finalT[..., None]],
        axis=-1,
    )
    # per-tile (num_tiles, P, 8) → group blocks (n_groups, GP, 8)
    num_tiles = packed.shape[0]
    n_groups = (num_tiles + GROUP - 1) // GROUP
    packed = jnp.pad(packed, ((0, n_groups * GROUP - num_tiles), (0, 0), (0, 0)))
    return packed.reshape(n_groups, GP, 8)


def _bins_tuple(bins: TileBins):
    return (
        bins.gid_end,
        bins.nt_orig,
        bins.tile_cnt,
        bins.chunk_tile,
        bins.chunk_base,
        bins.chunk_cnt,
        bins.aligned_gid,
    )


def _gather_cols_big(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Lane-gather columns of a possibly-large table. Re-measured this round
    on v5e at 1.28M-wide tables: a DIRECT gather is per-query latency-bound
    (~8.5 ms for 300k queries, 10 rows) but the former piecewise
    VMEM-sized-pieces strategy was 6x slower still (47 ms) — the where-select
    chain over full-width pieces dominates. Direct indexing is the fast path
    at every size measured; kept as a helper for benchmarks/ablation."""
    return table[:, idx]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _blend_core(xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret):
    out, _ = _blend_fwd_impl(
        xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret
    )
    return out


def _blend_fwd_impl(xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret):
    gid_end, nt_orig, tile_cnt, chunk_tile, chunk_base, chunk_cnt, aligned_gid = bins_arrays
    tiles_x = (W + BLOCK - 1) // BLOCK
    tiles_y = (H + BLOCK - 1) // BLOCK
    num_tiles = tiles_x * tiles_y
    n_groups = (num_tiles + GROUP - 1) // GROUP
    n_chan = colors.shape[1]
    ns = aligned_capacity // (SUPER * CHUNK)  # supersteps

    # ORIGINAL-order fields with one extra zero column at index N:
    # aligned_gid uses gid N as the pad sentinel, so pads gather zeros (then
    # the kernel's slot<cnt mask drops them anyway). The stream is
    # gid-indexed (round 5), so no depth reorder of the pack is needed —
    # the former `[:, order]` gather cost ~1.9 ms/step at garden scale.
    packed = _pack_fields(xys, conics, colors, opacs)  # (6+C, N)
    fr = jnp.pad(packed, ((0, 0), (0, 1)))
    vals_live = fr[:, aligned_gid]  # (6+C, aligned_cap) lane gather
    # (gathers are query-latency-bound, so the row count barely matters; the
    # pad may fuse into the gather — measured cost-neutral either way)
    vals = jnp.pad(vals_live, ((0, NFIELD - vals_live.shape[0]), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((NFIELD, SUPER * CHUNK), lambda s, ct, cb, cc_: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, GP, 16), lambda s, ct, cb, cc_: (ct[s * SUPER] // GROUP, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SMEM((GROUP,), jnp.int32)],
    )
    out_groups = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, n_chan=n_chan),
        out_shape=jax.ShapeDtypeStruct((n_groups, GP, 16), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_tile, chunk_base, chunk_cnt, vals)

    img, finalT = _tiles_to_image(out_groups, tiles_y, tiles_x, H, W, n_chan, tile_cnt)
    return (img, finalT), (vals, out_groups)


def _blend_core_fwd(xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret):
    out, (vals, out_tiles) = _blend_fwd_impl(
        xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret
    )
    return out, (vals, out_tiles, bins_arrays, xys.shape[0])


def _blend_core_bwd(H, W, capacity, aligned_capacity, interpret, res, cots):
    vals, out_groups, bins_arrays, N = res
    gid_end, nt_orig, tile_cnt, chunk_tile, chunk_base, chunk_cnt, aligned_gid = bins_arrays
    g_img, g_finalT = cots
    n_chan = g_img.shape[-1]
    tiles_x = (W + BLOCK - 1) // BLOCK
    tiles_y = (H + BLOCK - 1) // BLOCK
    ns = aligned_capacity // (SUPER * CHUNK)

    gout = _image_to_tiles(g_img, g_finalT, tiles_y, tiles_x, n_chan)  # (n_groups, GP, 8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((NFIELD, SUPER * CHUNK), lambda s, ct, cb, cc_: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GP, 16), lambda s, ct, cb, cc_: (ct[s * SUPER] // GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GP, 8), lambda s, ct, cb, cc_: (ct[s * SUPER] // GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (NFIELD, SUPER * CHUNK), lambda s, ct, cb, cc_: (0, s), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((GP, 8), jnp.float32), pltpu.SMEM((GROUP,), jnp.int32)],
    )
    slot_grads = pl.pallas_call(
        functools.partial(_bwd_kernel, tiles_x=tiles_x, n_chan=n_chan),
        out_shape=jax.ShapeDtypeStruct((NFIELD, aligned_capacity), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_tile, chunk_base, chunk_cnt, vals, out_groups, gout)

    # ---- slot grads (aligned layout) → per-gaussian grads, scatter-free ----
    # Sort the stream by aligned_gid CARRYING the gradient rows as payloads:
    # real slots of ORIGINAL gaussian g land contiguous (segments tile
    # [0, total) in gid order); pads and invalid slots carry gid N, sort
    # past capacity, and hold exact zeros. The payload sort beats the
    # (key, iota)-sort + permutation-gather variant by >10x (O(cap) queries
    # from a >VMEM table are latency-bound, measured round 4).
    cap = capacity
    nrow = 6 + n_chan  # rows beyond this are structural zero padding
    reordered = jax.lax.sort(
        (aligned_gid,) + tuple(slot_grads[r] for r in range(nrow)),
        num_keys=1, is_stable=True,
    )
    sg_slot = jnp.stack(reordered[1:], axis=0)[:, :cap]  # (nrow, cap)

    # per-gaussian segment sums, already in ORIGINAL order: ends are the
    # inclusive cumsum of nt_orig (ASCENDING — binning.gid_end), the low
    # boundary is the previous gaussian's end (one lane shift) — ONE
    # N-query gather total, no unsort (round 5; formerly two random
    # N-query gathers at ~4.5 ns/query each).
    prefix = cumsum_rows(sg_slot)  # (nrow, cap), blocked two-level scan
    hi_vals = prefix[:, gid_end]  # (nrow, N)
    lo_vals = jnp.concatenate(
        [jnp.zeros((nrow, 1), hi_vals.dtype), hi_vals[:, :-1]], axis=1
    )
    g_orig = jnp.where((nt_orig > 0)[None, :], hi_vals - lo_vals, 0.0)

    d_xys = jnp.stack([g_orig[0], g_orig[1]], axis=-1)
    d_conics = jnp.stack([g_orig[2], g_orig[3], g_orig[4]], axis=-1)
    d_opacs = g_orig[5]
    d_colors = jnp.stack([g_orig[6 + c] for c in range(n_chan)], axis=-1)
    d_bins = tuple(np.zeros(a.shape, jax.dtypes.float0) for a in bins_arrays)
    return d_xys, d_conics, d_colors, d_opacs, d_bins


_blend_core.defvjp(_blend_core_fwd, _blend_core_bwd)


def rasterize_tiles_pallas(
    xys: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacs: jnp.ndarray,
    bins: TileBins,
    img_height: int,
    img_width: int,
    interpret: bool = False,
) -> BlendOutputs:
    """Pallas tile blend. Unlike the jnp path this takes the per-gaussian
    arrays in ORIGINAL order (depth ordering is applied internally via
    ``bins.order``), and its VJP returns original-order gradients."""
    img, finalT = _blend_core(
        xys,
        conics,
        colors,
        opacs.reshape(-1),
        _bins_tuple(bins),
        img_height,
        img_width,
        bins.capacity,
        bins.aligned_capacity,
        interpret,
    )
    return BlendOutputs(img=img, final_T=finalT)
