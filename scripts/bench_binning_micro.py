"""Micro slope-timed breakdown of bin_gaussians internals + backward split.

Cumulative stages through the binning pipeline; differences between adjacent
rows give per-step device time. Same relay-proof methodology as
bench_stages.py (fori_loop slope between K_LO and K_HI iterations).

Usage: python scripts/bench_binning_micro.py [N] [S]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops import binning as B
from gaussctrl_exp_tpu.ops.binning import bin_gaussians
from gaussctrl_exp_tpu.ops.blend_pallas import rasterize_tiles_pallas
from gaussctrl_exp_tpu.ops.projection import project_gaussians
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

N = int(sys.argv[1]) if len(sys.argv) > 1 else 35_000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 18
TX = TY = (S + 15) // 16
K_LO, K_HI = 5, 50

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
target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))


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
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(means))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


def _proj(m):
    return project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)


# --- cumulative binning sub-stages (mirror bin_gaussians step numbering) ---

def upto_sort_cum(m):
    # mirrors bin_gaussians step 1 (payload-carrying depth sort)
    p = _proj(m)
    depth_key = jnp.where(p.mask, p.depths, jnp.inf)
    iota_n = jnp.arange(N, dtype=jnp.int32)
    _, order, nt_sorted, bb0, bb1, bb2, bb3 = jax.lax.sort(
        (depth_key, iota_n, p.num_tiles_hit, p.tile_bbox[:, 0], p.tile_bbox[:, 1],
         p.tile_bbox[:, 2], p.tile_bbox[:, 3]),
        num_keys=1, is_stable=True,
    )
    cum = jnp.cumsum(nt_sorted) - nt_sorted
    return (cum[:4] + bb0[:4] + order[:4]).astype(jnp.float32)


def upto_decode(m):
    p = _proj(m)
    depth_key = jnp.where(p.mask, p.depths, jnp.inf)
    iota_n = jnp.arange(N, dtype=jnp.int32)
    _, order, nt_sorted, bb0, bb1, bb2, bb3 = jax.lax.sort(
        (depth_key, iota_n, p.num_tiles_hit, p.tile_bbox[:, 0], p.tile_bbox[:, 1],
         p.tile_bbox[:, 2], p.tile_bbox[:, 3]),
        num_keys=1, is_stable=True,
    )
    cum = jnp.cumsum(nt_sorted) - nt_sorted
    bb_r = jnp.stack([bb0, bb1, bb2, bb3], axis=1)
    bits_bw = max(int(TX).bit_length(), 1)
    bw_r = jnp.maximum(bb_r[:, 2] - bb_r[:, 0], 1)
    gtab = jnp.stack([bb_r[:, 0] | (bb_r[:, 1] << 12), bw_r | (cum << bits_bw)], axis=0)
    slots = jnp.arange(CAP, dtype=jnp.int32)
    ranks_at_start = jnp.zeros(CAP, jnp.int32).at[cum].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    rank = jax.lax.associative_scan(jnp.maximum, ranks_at_start)
    rank = jnp.clip(rank, 0, N - 1)
    total = cum[-1] + nt_sorted[-1]
    valid = slots < jnp.minimum(total, CAP)
    g2 = gtab[:, rank]
    x0 = g2[0] & 4095
    y0 = g2[0] >> 12
    bw = g2[1] & ((1 << bits_bw) - 1)
    k = slots - (g2[1] >> bits_bw)
    ky = jnp.floor((k.astype(jnp.float32) + 0.5) / bw.astype(jnp.float32)).astype(jnp.int32)
    kx = k - ky * bw
    tile = (y0 + ky) * TX + (x0 + kx)
    tile = jnp.where(valid, tile, TX * TY).astype(jnp.int32)
    return (tile[:4] + rank[:4]).astype(jnp.float32)


def _through_tilesort(m):
    p = _proj(m)
    b = None
    # re-run the real thing but stop after step 4 by consuming only those outputs
    b = bin_gaussians(p, TX, TY, CAP)
    return b, p


def upto_tilesort(m):
    b, p = _through_tilesort(m)
    # consume only sorted_rank + tile ranges; aligned machinery gets DCE'd
    return (b.sorted_rank[:4] + b.tile_start[:4] + b.tile_cnt[:4]).astype(jnp.float32)


def upto_full_binning(m):
    b, p = _through_tilesort(m)
    return (
        b.sorted_rank[:4] + b.aligned_gid[:4] + b.chunk_tile[:4] + b.chunk_base[:4]
        + b.chunk_cnt[:4] + b.tile_start[:4]
    ).astype(jnp.float32)


# --- backward split ---

def fwd_loss(m):
    p = _proj(m)
    b = bin_gaussians(p, TX, TY, CAP)
    out = rasterize_tiles_pallas(p.xys, p.conics, colors, opacs, b, S, S)
    rgb = jnp.minimum(out.img[:, :, :3], 1.0)
    loss, _ = splatfacto_loss(rgb, target)
    return loss.reshape(1, 1) * jnp.ones((2, 2))


def bwd_blend_only(m):
    # grad wrt colors/opacs only: skips projection/binning backward
    def f(c, o):
        p = _proj(m)
        b = bin_gaussians(p, TX, TY, CAP)
        out = rasterize_tiles_pallas(p.xys, p.conics, c, o, b, S, S)
        rgb = jnp.minimum(out.img[:, :, :3], 1.0)
        loss, _ = splatfacto_loss(rgb, target)
        return loss

    gc, go = jax.grad(f, argnums=(0, 1))(colors, opacs)
    return gc[:2, :2] + go[:2, None][:2]


def bwd_full(m):
    def f(mm):
        p = _proj(mm)
        b = bin_gaussians(p, TX, TY, CAP)
        out = rasterize_tiles_pallas(p.xys, p.conics, colors, opacs, b, S, S)
        rgb = jnp.minimum(out.img[:, :, :3], 1.0)
        loss, _ = splatfacto_loss(rgb, target)
        return loss

    return jax.grad(f)(m)[:2, :2]


def loss_only(m):
    rgb = (m[:1, :1] * 1e-30 + target[..., :3])
    loss, _ = splatfacto_loss(jnp.minimum(rgb, 1.0), target * 0.9)
    return jax.grad(lambda r: splatfacto_loss(jnp.minimum(r, 1.0), target * 0.9)[0])(rgb)[:2, :2]


if __name__ == "__main__":
    print(f"N={N} S={S} CAP={CAP} — cumulative slope-timed ms")
    rows = [
        ("proj+depthsort+cum", upto_sort_cum),
        ("+ decode(mark+scan+gather)", upto_decode),
        ("+ tile sort+ranges", upto_tilesort),
        ("+ aligned keysort+chunks", upto_full_binning),
        ("fwd+loss (no grad)", fwd_loss),
        ("grad colors/opacs only", bwd_blend_only),
        ("grad means (full chain)", bwd_full),
        ("ssim loss fwd+bwd alone", loss_only),
    ]
    for name, fn in rows:
        print(f"{name:30s} {slope_time(fn):8.2f} ms")
