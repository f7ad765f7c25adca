"""Attribute the Pallas blend-forward time: grid/DMA overhead vs VPU
transcendentals vs MXU matmul. Slope-timed like bench_stages.py.

Variants (same binning, same shapes):
  base      — current production fwd kernel
  empty     — same grid/blocks, body only initializes the out block
              → pure grid + DMA overhead
  notrans   — exp/log1p replaced by cheap polynomials (WRONG math, same
              op count otherwise) → transcendental share
  nomatmul  — transmittance matmul replaced by a broadcast (WRONG math)
              → MXU share
  scan      — exclusive cumprod via 7-step lane-shift scan instead of
              log1p → matmul → exp (candidate optimization, exact math)
  pair      — two chunks per grid step (in-block (16, 256), fori over the
              two sub-chunks) → per-step overhead amortization

Usage: python scripts/bench_blend_variants.py [N] [S]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops.binning import bin_gaussians
from gaussctrl_exp_tpu.ops import blend_pallas as BP
from gaussctrl_exp_tpu.ops.blend_pallas import (
    CHUNK,
    NFIELD,
    P,
    _pack_fields,
    _pixel_coords,
    _triu_strict,
)
from gaussctrl_exp_tpu.ops.blend import ALPHA_CLAMP, MIN_ALPHA, T_EPS
from gaussctrl_exp_tpu.ops.projection import project_gaussians

N = int(sys.argv[1]) if len(sys.argv) > 1 else 35_000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CAP = 1 << 18
TX = TY = (S + 15) // 16
K_LO, K_HI = 5, 30

rng = np.random.default_rng(0)
means = jnp.asarray(rng.normal(size=(N, 3)).astype(np.float32) * 0.8)
scales = jnp.asarray(np.exp(rng.normal(size=(N, 3)).astype(np.float32) * 0.5 - 4.2))
quats = jnp.asarray(rng.normal(size=(N, 4)).astype(np.float32))
colors = jnp.asarray(rng.uniform(0, 1, (N, 4)).astype(np.float32))
opacs = jnp.asarray(rng.uniform(0.3, 0.9, N).astype(np.float32))
cam = make_camera(
    look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)), S * 1.05, S * 1.05, S / 2, S / 2, S, S
)
vm, pm, fm = camera_matrices(cam)


def _alphas(g, px, py, base, cnt, mode):
    gx, gy = g[0:1, :], g[1:2, :]
    ca, cb, cc = g[2:3, :], g[3:4, :], g[4:5, :]
    op = g[5:6, :]
    dx = gx - px
    dy = gy - py
    sigma = 0.5 * (ca * dx * dx + cc * dy * dy) + cb * dx * dy
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + base
    valid = slot < cnt
    if mode == "notrans":
        vis = 1.0 / (1.0 + sigma)  # cheap rational stand-in
    else:
        vis = jnp.exp(-sigma)
    alpha = jnp.minimum(ALPHA_CLAMP, op * vis)
    ok = valid & (sigma >= 0.0) & (alpha >= MIN_ALPHA)
    aeff = jnp.where(ok, alpha, 0.0)
    one_minus = 1.0 - aeff
    if mode == "notrans":
        L = -aeff  # linear stand-in for log1p
    else:
        L = jnp.log1p(-aeff)
    return aeff, one_minus, L


def make_fwd_kernel(mode):
    def kern(chunk_tile, chunk_base, chunk_cnt, g_ref, out_ref, done_s, *, tiles_x, n_chan):
        c = pl.program_id(0)
        t = chunk_tile[c]
        base = chunk_base[c]
        cnt = chunk_cnt[c]

        @pl.when(base == 0)
        def _():
            col = jax.lax.broadcasted_iota(jnp.int32, (P, 16), 1)
            out_ref[0] = jnp.where(col == 7, 1.0, 0.0)
            done_s[0] = 0

        if mode == "empty":
            return

        @pl.when((base < cnt) & (done_s[0] == 0))
        def _():
            px, py = _pixel_coords(t, tiles_x)
            g = g_ref[:, :]
            aeff, one_minus, L = _alphas(g, px, py, base, cnt, mode)
            T_carry = out_ref[0, :, 7:8]
            done = out_ref[0, :, 8:9] > 0.0

            if mode == "nomatmul":
                T_excl = T_carry * (1.0 + L * 0.0)  # skip cumulation entirely
            elif mode == "scan":
                # exclusive cumprod along the 128-lane axis: Hillis-Steele
                # inclusive scan (7 shift-multiply passes), then shift by one
                lane = jax.lax.broadcasted_iota(jnp.int32, (P, CHUNK), 1)
                scan = one_minus
                shift = 1
                while shift < CHUNK:
                    r = pltpu.roll(scan, shift, 1)
                    scan = scan * jnp.where(lane >= shift, r, 1.0)
                    shift *= 2
                excl_scan = pltpu.roll(scan, 1, 1)
                excl_scan = jnp.where(lane >= 1, excl_scan, 1.0)
                T_excl = T_carry * excl_scan
            else:
                cum_excl = jnp.dot(L, _triu_strict(), preferred_element_type=jnp.float32)
                T_excl = T_carry * jnp.exp(cum_excl)

            T_after = T_excl * one_minus
            comp = (T_after > T_EPS) & (aeff > 0.0) & jnp.logical_not(done)
            w = jnp.where(comp, aeff * T_excl, 0.0)
            colors_ = g[6 : 6 + n_chan, :]
            contrib = jax.lax.dot_general(
                w, colors_, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            out_ref[0, :, 0:n_chan] = out_ref[0, :, 0:n_chan] + contrib
            T_new = jnp.min(jnp.where(comp, T_after, T_carry), axis=1, keepdims=True)
            broke = jnp.min(jnp.where(aeff > 0.0, T_after, 1.0), axis=1, keepdims=True) <= T_EPS
            done_new = jnp.where(done | broke, 1.0, 0.0)
            out_ref[0, :, 7:8] = T_new
            out_ref[0, :, 8:9] = done_new
            done_s[0] = (jnp.min(done_new) > 0.0).astype(jnp.int32)

    return kern


def make_pair_kernel():
    """Two 128-chunks per grid step; sub-chunks of one step share a tile only
    if binning guarantees it — here we just guard per sub-chunk (the second
    sub-chunk may belong to a different tile, in which case the out block
    mapping is wrong; for OVERHEAD MEASUREMENT we still write — the timing is
    what matters, flagged as approximate)."""

    def kern(chunk_tile, chunk_base, chunk_cnt, g_ref, out_ref, done_s, *, tiles_x, n_chan):
        c2 = pl.program_id(0)

        @pl.when(chunk_base[2 * c2] == 0)
        def _():
            col = jax.lax.broadcasted_iota(jnp.int32, (P, 16), 1)
            out_ref[0] = jnp.where(col == 7, 1.0, 0.0)
            done_s[0] = 0

        for sub in range(2):
            c = 2 * c2 + sub
            t = chunk_tile[c]
            base = chunk_base[c]
            cnt = chunk_cnt[c]

            @pl.when((base < cnt) & (done_s[0] == 0))
            def _(sub=sub, t=t, base=base, cnt=cnt):
                px, py = _pixel_coords(t, tiles_x)
                g = g_ref[:, sub * CHUNK : (sub + 1) * CHUNK]
                aeff, one_minus, L = _alphas(g, px, py, base, cnt, "base")
                T_carry = out_ref[0, :, 7:8]
                done = out_ref[0, :, 8:9] > 0.0
                cum_excl = jnp.dot(L, _triu_strict(), preferred_element_type=jnp.float32)
                T_excl = T_carry * jnp.exp(cum_excl)
                T_after = T_excl * one_minus
                comp = (T_after > T_EPS) & (aeff > 0.0) & jnp.logical_not(done)
                w = jnp.where(comp, aeff * T_excl, 0.0)
                colors_ = g[6 : 6 + n_chan, :]
                contrib = jax.lax.dot_general(
                    w, colors_, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                out_ref[0, :, 0:n_chan] = out_ref[0, :, 0:n_chan] + contrib
                T_new = jnp.min(jnp.where(comp, T_after, T_carry), axis=1, keepdims=True)
                broke = jnp.min(jnp.where(aeff > 0.0, T_after, 1.0), axis=1, keepdims=True) <= T_EPS
                done_new = jnp.where(done | broke, 1.0, 0.0)
                out_ref[0, :, 7:8] = T_new
                out_ref[0, :, 8:9] = done_new
                done_s[0] = (jnp.min(done_new) > 0.0).astype(jnp.int32)

    return kern


def fwd_variant(mode):
    def run(m):
        proj = project_gaussians(
            m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S
        )
        bins = bin_gaussians(proj, TX, TY, CAP)
        n_chan = colors.shape[1]
        nc = bins.aligned_capacity // CHUNK
        packed_rank = _pack_fields(proj.xys, proj.conics, colors, opacs)[:, bins.order]
        fr = jnp.pad(packed_rank, ((0, 0), (0, 1)))
        vals = fr[:, bins.aligned_gid]
        num_tiles = TX * TY

        if mode == "pair":
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nc // 2,),
                in_specs=[
                    pl.BlockSpec((NFIELD, 2 * CHUNK), lambda c, ct, cb, cc_: (0, c),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, P, 16), lambda c, ct, cb, cc_: (ct[2 * c], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            )
            kern = make_pair_kernel()
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nc,),
                in_specs=[
                    pl.BlockSpec((NFIELD, CHUNK), lambda c, ct, cb, cc_: (0, c),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, P, 16), lambda c, ct, cb, cc_: (ct[c], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            )
            kern = make_fwd_kernel(mode)
        out_tiles = pl.pallas_call(
            functools.partial(kern, tiles_x=TX, n_chan=n_chan),
            out_shape=jax.ShapeDtypeStruct((num_tiles, P, 16), jnp.float32),
            grid_spec=grid_spec,
        )(bins.chunk_tile, bins.chunk_base, bins.chunk_cnt, vals)
        return out_tiles[:2, :2, 0] + out_tiles[:2, :2, 7]

    return run


def slope_time(stage_fn):
    walls = {}
    for K in (K_LO, K_HI):

        @jax.jit
        def run(m0):
            def body(i, acc):
                out = stage_fn(m0 + acc[:1, :1] * 1e-30)
                return acc + out.reshape(-1)[:4].reshape(2, 2).astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        jax.device_get(run(means))
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            jax.device_get(run(means))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


if __name__ == "__main__":
    print(f"N={N} S={S} CAP={CAP} — blend fwd variants, slope ms (incl. binning)", flush=True)
    for mode in ("base", "empty", "notrans", "nomatmul", "scan", "pair"):
        try:
            t = slope_time(fwd_variant(mode))
            print(f"{mode:10s} {t:8.2f} ms", flush=True)
        except Exception as e:  # noqa
            print(f"{mode:10s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
