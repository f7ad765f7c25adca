"""Pallas TPU kernels for tile rasterization (forward + custom VJP).

TPU-native replacement for gsplat v0.1.2's ``rasterize_gaussians`` CUDA
kernels (the hot fwd/bwd pair behind /root/reference/gaussctrl/gc_model.py:208-236).
The CUDA design is a serial per-pixel loop over depth-sorted gaussians with
atomics in the backward; on TPU the same math is re-derived as dense streaming
algebra shaped by measured v5e costs (sorts/scans/lane-gathers fast; scatters,
row/column gathers and searchsorted slow):

  * binning (ops/binning.py) provides depth-sorted per-tile slot lists, a
    *virtual* CHUNK-aligned layout (per-tile starts rounded to ALIGN=32 sub-chunks), per-chunk
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

from .binning import ALIGN as SUB, GROUP, STEP_SUBS, TileBins
from .scan2d import cumsum_rows
from .blend import ALPHA_CLAMP, MIN_ALPHA, T_EPS, BlendOutputs
from .projection import BLOCK

CHUNK = 128  # gaussians per chunk (MXU-aligned DMA/matmul granularity)
NSUB = CHUNK // SUB  # 32-slot sub-chunks (each owned by ONE tile) per chunk
SUPER = (STEP_SUBS * SUB) // CHUNK  # chunks per grid step
NFIELD = 16  # packed field rows: x y ca cb cc opac c0..c3 (+pad)
P = BLOCK * BLOCK  # 256 pixels per tile
GP = GROUP * P  # pixels per output block (GROUP tiles resident together)


def _pack_fields(xys, conics, colors, opacs) -> jnp.ndarray:
    """Per-gaussian data (N, ·) → (NFIELD, N) field-major array."""
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
    data = jnp.stack(rows, axis=0)  # (6+C, N)
    return jnp.pad(data, ((0, NFIELD - data.shape[0]), (0, 0)))


def _lane_iota():
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    return lane // SUB, jax.lax.rem(lane, SUB)  # sub-chunk id / slot-in-sub per lane


def _lanesel(vals, lane_sub):
    """NSUB scalars → (1, CHUNK) int32 with value vals[k] on sub-chunk k's lanes."""
    v = jnp.zeros((1, CHUNK), jnp.int32)
    for k, val in enumerate(vals):
        v = jnp.where(lane_sub == k, val, v)
    return v


def _lane_pixel_coords(ts, tiles_x, lane_sub):
    """Per-lane pixel coords: lane j covers sub-chunk j//SUB whose tile is ts[k];
    (P, CHUNK) px/py = within-tile pixel position + that tile's origin."""
    tx = _lanesel([jax.lax.rem(t, tiles_x) for t in ts], lane_sub).astype(jnp.float32)
    ty = _lanesel([t // tiles_x for t in ts], lane_sub).astype(jnp.float32)
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    py = (pix // BLOCK).astype(jnp.float32) + ty * BLOCK
    px = jax.lax.rem(pix, BLOCK).astype(jnp.float32) + tx * BLOCK
    return px, py


def _masked_triu(ts):
    """(strict, inclusive) triangular masks restricted to same-tile lane pairs.

    M[j', j] = (j' < j) · [tile(j') == tile(j)] — the transmittance matmul
    then accumulates log-opacity only over earlier gaussians of the SAME tile,
    which makes a 128-chunk spanning up to NSUB tile segments exact: lanes of
    other tiles contribute nothing, and multiple sub-chunks of one tile chain
    within the chunk automatically."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    tr = jnp.zeros((CHUNK, CHUNK), jnp.int32)
    tc = jnp.zeros((CHUNK, CHUNK), jnp.int32)
    for k, t in enumerate(ts):
        tr = jnp.where(r // SUB == k, t, tr)
        tc = jnp.where(c // SUB == k, t, tc)
    same = (tr == tc).astype(jnp.float32)
    return (r < c).astype(jnp.float32) * same, (r <= c).astype(jnp.float32) * same


def _row_cols(read_fn, rows, lane_sub):
    """Assemble (P, CHUNK) from per-tile-row (P, 1) columns, selected per lane."""
    out = jnp.zeros((P, CHUNK), jnp.float32)
    for k, row in enumerate(rows):
        out = jnp.where(lane_sub == k, read_fn(row), out)
    return out


def _chunk_alphas(g, px, py, slot, cnt):
    """Alpha computation for one (NFIELD, CHUNK) chunk against its pixels."""
    gx, gy = g[0:1, :], g[1:2, :]
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    op = g[5:6, :]
    dx = gx - px  # (P, CHUNK)
    dy = gy - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    valid = slot < cnt
    vis = jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_CLAMP, op * vis)
    ok = valid & (sigma >= 0.0) & (alpha >= MIN_ALPHA)
    aeff = jnp.where(ok, alpha, 0.0)
    one_minus = 1.0 - aeff
    L = jnp.log1p(-aeff)
    return aeff, one_minus, L, dx, dy, ca, cb, cc, op, vis


def _fwd_kernel(sub_tile, sub_base, sub_cnt, g_ref, out_ref, done_s, *, tiles_x, n_chan):
    """One grid step (SUPER chunks, each spanning NSUB 32-slot sub-chunks)
    against its GROUP's resident pixel rows.

    out block (1, GP, 16): GROUP tile rows of 256 pixels; per tile row,
    cols [0:n_chan) composited image, col 7 final_T, col 8 done flag.
    Revisited by consecutive steps of the same group (binning pads each
    group's sub-chunk count to STEP_SUBS, so a step never crosses a group).
    A 128-chunk may span up to NSUB different tiles: the heavy VPU math and
    the transmittance matmul run dense over (P, CHUNK) with per-lane pixel
    coordinates and a same-tile triangular mask (_masked_triu); only the
    narrow carry updates (T, done) touch per-tile rows. Padding sub-chunks
    (base ≥ cnt) and fully-done tiles cost nothing beyond their block DMA.
    """
    s = pl.program_id(0)
    i0 = s * SUPER * NSUB
    g0 = sub_tile[i0] // GROUP
    prev_g = sub_tile[jnp.maximum(i0 - SUPER * NSUB, 0)] // GROUP

    @pl.when((s == 0) | (prev_g != g0))
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, (GP, 16), 1)
        out_ref[0] = jnp.where(col == 7, 1.0, 0.0)  # img=0, T=1, done=0
        for r in range(GROUP):
            done_s[r] = 0

    lane_sub, lane_in = _lane_iota()

    def chunk_body(c, _):
        idx = [i0 + c * NSUB + k for k in range(NSUB)]
        ts = [sub_tile[i] for i in idx]
        bases = [sub_base[i] for i in idx]
        cnts = [sub_cnt[i] for i in idx]
        rows = [t - g0 * GROUP for t in ts]
        act = [(bases[k] < cnts[k]) & (done_s[rows[k]] == 0) for k in range(NSUB)]
        work = functools.reduce(lambda a, b: a | b, act)

        @pl.when(work)
        def _(ts=ts, bases=bases, cnts=cnts, rows=rows):
            px, py = _lane_pixel_coords(ts, tiles_x, lane_sub)
            slot = lane_in + _lanesel(bases, lane_sub)
            cnt_lane = _lanesel(cnts, lane_sub)
            g = g_ref[:, pl.ds(c * CHUNK, CHUNK)]  # (NFIELD, CHUNK)
            aeff, one_minus, L, *_ = _chunk_alphas(g, px, py, slot, cnt_lane)

            T_carry = _row_cols(lambda r_: out_ref[0, pl.ds(r_ * P, P), 7:8], rows, lane_sub)
            done_l = _row_cols(lambda r_: out_ref[0, pl.ds(r_ * P, P), 8:9], rows, lane_sub) > 0.0

            M_excl, _ = _masked_triu(ts)
            cum_excl = jnp.dot(L, M_excl, preferred_element_type=jnp.float32)
            T_excl = T_carry * jnp.exp(cum_excl)  # (P, CHUNK)
            T_after = T_excl * one_minus
            comp = (T_after > T_EPS) & (aeff > 0.0) & jnp.logical_not(done_l)
            w = jnp.where(comp, aeff * T_excl, 0.0)
            colors = g[6 : 6 + n_chan, :]  # (C, CHUNK)

            for k in range(NSUB):
                sl = slice(k * SUB, (k + 1) * SUB)
                ro = pl.ds(rows[k] * P, P)
                contrib = jax.lax.dot_general(
                    w[:, sl], colors[:, sl], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (P, C)
                out_ref[0, ro, 0:n_chan] = out_ref[0, ro, 0:n_chan] + contrib
                T_new = jnp.minimum(
                    out_ref[0, ro, 7:8],
                    jnp.min(jnp.where(comp[:, sl], T_after[:, sl], 1e30),
                            axis=1, keepdims=True),
                )
                broke = jnp.min(
                    jnp.where(aeff[:, sl] > 0.0, T_after[:, sl], 1.0),
                    axis=1, keepdims=True,
                ) <= T_EPS
                done_new = jnp.where((out_ref[0, ro, 8:9] > 0.0) | broke, 1.0, 0.0)
                out_ref[0, ro, 7:8] = T_new
                out_ref[0, ro, 8:9] = done_new
                done_s[rows[k]] = (jnp.min(done_new) > 0.0).astype(jnp.int32)

        return None

    jax.lax.fori_loop(0, SUPER, chunk_body, None)


def _bwd_kernel(
    sub_tile,
    sub_base,
    sub_cnt,
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
    """Backward sweep over the same sub-chunk stream: per-slot gradients.

    res_ref/gout_ref: (1, GP, 16) forward residual / cotangent blocks of this
    step's GROUP. sg_ref: (NFIELD, SUPER·CHUNK) output block — every step
    writes its own block (no gaps, no races). state: (GP, 8) VMEM scratch
    persisting across grid steps, one (P, 8) band per tile row: col 0 T_carry,
    col 1 done, col 2 prefix_u. Chunk math is dense (P, CHUNK) with per-lane
    image rows (assembled via _row_cols) and same-tile masked triangular
    matmuls; suffix_u = img·g − prefix_u as in the single-sweep derivation.
    """
    s = pl.program_id(0)
    i0 = s * SUPER * NSUB
    g0 = sub_tile[i0] // GROUP
    prev_g = sub_tile[jnp.maximum(i0 - SUPER * NSUB, 0)] // GROUP

    @pl.when((s == 0) | (prev_g != g0))
    def _():
        col = jax.lax.broadcasted_iota(jnp.int32, (GP, 8), 1)
        state[:, :] = jnp.where(col == 0, 1.0, 0.0)  # T=1, done=0, prefix_u=0
        for r in range(GROUP):
            done_s[r] = 0

    lane_sub, lane_in = _lane_iota()

    def chunk_body(c, _unused):
        idx = [i0 + c * NSUB + k for k in range(NSUB)]
        ts = [sub_tile[i] for i in idx]
        bases = [sub_base[i] for i in idx]
        cnts = [sub_cnt[i] for i in idx]
        rows = [t - g0 * GROUP for t in ts]
        act = [(bases[k] < cnts[k]) & (done_s[rows[k]] == 0) for k in range(NSUB)]
        work = functools.reduce(lambda a, b: a | b, act)
        so = pl.ds(c * CHUNK, CHUNK)

        @pl.when(jnp.logical_not(work))
        def _(so=so):
            sg_ref[:, so] = jnp.zeros((NFIELD, CHUNK), jnp.float32)

        @pl.when(work)
        def _(ts=ts, bases=bases, cnts=cnts, rows=rows, so=so):
            px, py = _lane_pixel_coords(ts, tiles_x, lane_sub)
            slot = lane_in + _lanesel(bases, lane_sub)
            cnt_lane = _lanesel(cnts, lane_sub)
            g = g_ref[:, so]
            aeff, one_minus, L, dx, dy, ca, cb, cc, op, vis = _chunk_alphas(
                g, px, py, slot, cnt_lane
            )
            colors = g[6 : 6 + n_chan, :]  # (C, CHUNK)

            T_carry = _row_cols(lambda r_: state[pl.ds(r_ * P, P), 0:1], rows, lane_sub)
            done_l = _row_cols(lambda r_: state[pl.ds(r_ * P, P), 1:2], rows, lane_sub) > 0.0
            prefix_u_l = _row_cols(lambda r_: state[pl.ds(r_ * P, P), 2:3], rows, lane_sub)

            # per-lane image rows: cg via NSUB small matmuls + lane select;
            # img·g and g_T·T_final as (P, 1) columns lane-selected likewise
            g_img_rows = [gout_ref[0, pl.ds(rows[k] * P, P), 0:n_chan] for k in range(NSUB)]
            cg = jnp.zeros((P, CHUNK), jnp.float32)
            img_dot_g = jnp.zeros((P, CHUNK), jnp.float32)
            gTf = jnp.zeros((P, CHUNK), jnp.float32)
            for k in range(NSUB):
                ro = pl.ds(rows[k] * P, P)
                m = lane_sub == k
                cg_k = jnp.dot(g_img_rows[k], colors, preferred_element_type=jnp.float32)
                cg = jnp.where(m, cg_k, cg)
                idg_k = jnp.sum(res_ref[0, ro, 0:n_chan] * g_img_rows[k], axis=1, keepdims=True)
                img_dot_g = jnp.where(m, idg_k, img_dot_g)
                gTf_k = gout_ref[0, ro, 7:8] * res_ref[0, ro, 7:8]
                gTf = jnp.where(m, gTf_k, gTf)

            M_excl, M_incl = _masked_triu(ts)
            cum_excl = jnp.dot(L, M_excl, preferred_element_type=jnp.float32)
            T_excl = T_carry * jnp.exp(cum_excl)
            T_after = T_excl * one_minus
            comp = (T_after > T_EPS) & (aeff > 0.0) & jnp.logical_not(done_l)
            compf = comp.astype(jnp.float32)
            w = aeff * T_excl * compf
            u = w * cg
            prefix_incl = prefix_u_l + jnp.dot(u, M_incl, preferred_element_type=jnp.float32)
            suffix = img_dot_g - prefix_incl  # Σ_{k>j} u_k (within + later chunks)

            dalpha = compf * (T_excl * cg - (suffix + gTf) / one_minus)
            dsigma = -(op * vis) * dalpha  # gsplat: no gating on the 0.999 clamp
            dopac = vis * dalpha
            gdx = dsigma * (ca * dx + cb * dy)
            gdy = dsigma * (cb * dx + cc * dy)

            sg_ref[0:1, so] = jnp.sum(gdx, axis=0, keepdims=True)
            sg_ref[1:2, so] = jnp.sum(gdy, axis=0, keepdims=True)
            sg_ref[2:3, so] = jnp.sum(dsigma * 0.5 * dx * dx, axis=0, keepdims=True)
            sg_ref[3:4, so] = jnp.sum(dsigma * dx * dy, axis=0, keepdims=True)
            sg_ref[4:5, so] = jnp.sum(dsigma * 0.5 * dy * dy, axis=0, keepdims=True)
            sg_ref[5:6, so] = jnp.sum(dopac, axis=0, keepdims=True)
            # color grads: dC[c', j] = Σ_p g_img[p at lane j's tile, c']·w[p, j].
            # Assemble the per-lane image-grad channel with _row_cols and reduce
            # over pixels — every store below is a full-CHUNK row at the
            # 128-aligned offset `so` (Mosaic rejects sub-chunk 32-lane stores).
            for ci in range(n_chan):
                gimg_c = _row_cols(
                    lambda r_, ci=ci: gout_ref[0, pl.ds(r_ * P, P), ci : ci + 1],
                    rows, lane_sub,
                )
                sg_ref[6 + ci : 7 + ci, so] = jnp.sum(gimg_c * w, axis=0, keepdims=True)
            sg_ref[6 + n_chan :, so] = jnp.zeros((NFIELD - 6 - n_chan, CHUNK), jnp.float32)

            for k in range(NSUB):
                sl = slice(k * SUB, (k + 1) * SUB)
                ro = pl.ds(rows[k] * P, P)
                T_new = jnp.minimum(
                    state[ro, 0:1],
                    jnp.min(jnp.where(comp[:, sl], T_after[:, sl], 1e30),
                            axis=1, keepdims=True),
                )
                broke = jnp.min(
                    jnp.where(aeff[:, sl] > 0.0, T_after[:, sl], 1.0),
                    axis=1, keepdims=True,
                ) <= T_EPS
                done_new = jnp.where((state[ro, 1:2] > 0.0) | broke, 1.0, 0.0)
                state[ro, 0:1] = T_new
                state[ro, 1:2] = done_new
                state[ro, 2:3] = state[ro, 2:3] + jnp.sum(u[:, sl], axis=1, keepdims=True)
                done_s[rows[k]] = (jnp.min(done_new) > 0.0).astype(jnp.int32)

        return None

    jax.lax.fori_loop(0, SUPER, chunk_body, None)


def _tiles_to_image(out_groups, tiles_y, tiles_x, H, W, n_chan, tile_cnt):
    # group blocks (n_groups, GP, 16) → per-tile (num_tiles, P, 16); groups
    # are contiguous runs of GROUP tiles so this is a pure reshape
    out_tiles = out_groups.reshape(-1, P, 16)[: tiles_y * tiles_x]
    # tiles with zero chunks were never visited: force img=0, T=1 there
    empty = (tile_cnt == 0)[:, None, None]
    img = jnp.where(empty, 0.0, out_tiles[:, :, :n_chan])
    T = jnp.where(empty[:, :, 0], 1.0, out_tiles[:, :, 7])
    img = img.reshape(tiles_y, tiles_x, BLOCK, BLOCK, n_chan)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * BLOCK, tiles_x * BLOCK, n_chan)
    T = T.reshape(tiles_y, tiles_x, BLOCK, BLOCK)
    T = T.transpose(0, 2, 1, 3).reshape(tiles_y * BLOCK, tiles_x * BLOCK)
    return img[:H, :W], T[:H, :W]


def _image_to_tiles(img, finalT, tiles_y, tiles_x, n_chan):
    H, W = finalT.shape
    pad_h, pad_w = tiles_y * BLOCK - H, tiles_x * BLOCK - W
    img = jnp.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    finalT = jnp.pad(finalT, ((0, pad_h), (0, pad_w)))
    img = img.reshape(tiles_y, BLOCK, tiles_x, BLOCK, n_chan).transpose(0, 2, 1, 3, 4)
    img = img.reshape(tiles_y * tiles_x, P, n_chan)
    finalT = finalT.reshape(tiles_y, BLOCK, tiles_x, BLOCK).transpose(0, 2, 1, 3)
    finalT = finalT.reshape(tiles_y * tiles_x, P)
    packed = jnp.concatenate(
        [img, jnp.zeros((img.shape[0], P, 7 - n_chan)), finalT[..., None],
         jnp.zeros((img.shape[0], P, 8))],
        axis=-1,
    )
    # per-tile (num_tiles, P, 16) → group blocks (n_groups, GP, 16)
    num_tiles = packed.shape[0]
    n_groups = (num_tiles + GROUP - 1) // GROUP
    packed = jnp.pad(packed, ((0, n_groups * GROUP - num_tiles), (0, 0), (0, 0)))
    return packed.reshape(n_groups, GP, 16)


def _bins_tuple(bins: TileBins):
    return (
        bins.order,
        bins.cum,
        bins.nt_sorted,
        bins.tile_cnt,
        bins.sub_tile,
        bins.sub_base,
        bins.sub_cnt,
        bins.aligned_rank,
    )


def _gather_cols_big(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Lane-gather columns of a possibly-large table without falling off the
    TPU fast path: gathers are fast only when the table fits VMEM (measured
    cliff between 8 MB and 16 MB on v5e), so split big tables into 2^17-lane
    pieces and select."""
    R, C = table.shape
    H = 1 << 17
    if C <= H:
        return table[:, idx]
    out = jnp.zeros((R, idx.shape[0]), table.dtype)
    for p in range(0, C, H):
        piece = table[:, p : p + H]
        local = jnp.clip(idx - p, 0, piece.shape[1] - 1)
        sel = (idx >= p) & (idx < p + H)
        out = jnp.where(sel[None, :], piece[:, local], out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _blend_core(xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret):
    out, _ = _blend_fwd_impl(
        xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret
    )
    return out


def _blend_fwd_impl(xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret):
    order, cum, nt_sorted, tile_cnt, sub_tile, sub_base, sub_cnt, aligned_rank = bins_arrays
    tiles_x = (W + BLOCK - 1) // BLOCK
    tiles_y = (H + BLOCK - 1) // BLOCK
    num_tiles = tiles_x * tiles_y
    n_groups = (num_tiles + GROUP - 1) // GROUP
    n_chan = colors.shape[1]
    ns = aligned_capacity // (SUPER * CHUNK)  # grid steps

    # rank-major fields with one extra zero column at index N: aligned_rank
    # uses rank N as the pad sentinel, so pads gather zeros (then the kernel's
    # slot<cnt mask drops them anyway). Both gathers read small (N-lane)
    # tables — the measured fast path.
    packed_rank = _pack_fields(xys, conics, colors, opacs)[:, order]  # (16, N)
    fr = jnp.pad(packed_rank, ((0, 0), (0, 1)))
    vals = fr[:, aligned_rank]  # (16, aligned_cap) small-table lane gather

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((NFIELD, SUPER * CHUNK), lambda s, ct, cb, cc_: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, GP, 16), lambda s, ct, cb, cc_: (ct[s * SUPER * NSUB] // GROUP, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SMEM((GROUP,), jnp.int32)],
    )
    out_groups = pl.pallas_call(
        functools.partial(_fwd_kernel, tiles_x=tiles_x, n_chan=n_chan),
        out_shape=jax.ShapeDtypeStruct((n_groups, GP, 16), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(sub_tile, sub_base, sub_cnt, vals)

    img, finalT = _tiles_to_image(out_groups, tiles_y, tiles_x, H, W, n_chan, tile_cnt)
    return (img, finalT), (vals, out_groups)


def _blend_core_fwd(xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret):
    out, (vals, out_tiles) = _blend_fwd_impl(
        xys, conics, colors, opacs, bins_arrays, H, W, capacity, aligned_capacity, interpret
    )
    return out, (vals, out_tiles, bins_arrays, xys.shape[0])


def _blend_core_bwd(H, W, capacity, aligned_capacity, interpret, res, cots):
    vals, out_groups, bins_arrays, N = res
    order, cum, nt_sorted, tile_cnt, sub_tile, sub_base, sub_cnt, aligned_rank = bins_arrays
    g_img, g_finalT = cots
    n_chan = g_img.shape[-1]
    tiles_x = (W + BLOCK - 1) // BLOCK
    tiles_y = (H + BLOCK - 1) // BLOCK
    ns = aligned_capacity // (SUPER * CHUNK)

    gout = _image_to_tiles(g_img, g_finalT, tiles_y, tiles_x, n_chan)  # (n_groups, GP, 16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ns,),
        in_specs=[
            pl.BlockSpec((NFIELD, SUPER * CHUNK), lambda s, ct, cb, cc_: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GP, 16), lambda s, ct, cb, cc_: (ct[s * SUPER * NSUB] // GROUP, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GP, 16), lambda s, ct, cb, cc_: (ct[s * SUPER * NSUB] // GROUP, 0, 0),
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
    )(sub_tile, sub_base, sub_cnt, vals, out_groups, gout)

    # ---- slot grads (aligned layout) → per-gaussian grads, scatter-free ----
    # Sort the stream by aligned_rank so real slots of rank g land contiguous
    # at [cum[g], cum[g]+nt[g]) (exactly the pre-sort slot layout); pads and
    # invalid slots carry rank N, sort past capacity, and hold exact zeros
    # (the kernel writes zeros wherever slot ≥ cnt or the chunk was skipped).
    # Profiled on v5e: sorting all 10 gradient rows as payloads costs 1.57 ms
    # at 180k slots; sorting only (key, iota) and applying the permutation as
    # a VMEM-sized blocked row gather is ~3× cheaper for the same result.
    cap = capacity
    nrow = 6 + n_chan  # rows beyond this are structural zero padding
    iota_a = jnp.arange(aligned_rank.shape[0], dtype=jnp.int32)
    _, perm = jax.lax.sort((aligned_rank, iota_a), num_keys=1, is_stable=True)
    sg_slot = _gather_cols_big(slot_grads[:nrow], perm[:cap])  # (nrow, cap)

    # per-gaussian (rank) segment sums: cumsum + ends difference
    prefix = cumsum_rows(sg_slot)  # (nrow, cap), blocked two-level scan
    hi_idx = jnp.clip(cum + nt_sorted - 1, 0, cap - 1)
    lo_idx = jnp.clip(cum - 1, 0, cap - 1)
    hi = _gather_cols_big(prefix, hi_idx)
    lo = jnp.where((cum > 0)[None, :], _gather_cols_big(prefix, lo_idx), 0.0)
    g_rank = jnp.where((nt_sorted > 0)[None, :], hi - lo, 0.0)  # (16, N)

    # unsort ranks → original gaussian order (small sort)
    iota_n = jnp.arange(N, dtype=jnp.int32)
    _, inv_order = jax.lax.sort((order, iota_n), num_keys=1, is_stable=True)
    g_orig = g_rank[:, inv_order]

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
