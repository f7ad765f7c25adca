"""Binning sub-step profile (slope-timed, relay-proof): where do ~4 ms go?

Each stage consumes its outputs; stages are cumulative prefixes of
ops/binning.py::bin_gaussians so the delta between lines is one sub-step.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops.binning import ALIGN, _aligned_capacity, _HUGE1, _HUGE2
from gaussctrl_exp_tpu.ops.projection import project_gaussians

S = bench.S
CAP = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
means, scales, quats, chan, opacs = bench.load_scene()
N = means.shape[0]
cam = make_camera(look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
                  fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S)
vm, pm, fm = camera_matrices(cam)
TX = TY = (S + 15) // 16
num_tiles = TX * TY


def proj(m):
    return project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy,
                             cam.cx, cam.cy, S, S, opacities=opacs)


def upto(stage):
    def fn(m):
        p = proj(m)
        depth_key = jnp.where(p.mask, p.depths, jnp.inf)
        order = jnp.argsort(depth_key)
        nt_sorted = p.num_tiles_hit[order]
        cum = jnp.cumsum(nt_sorted) - nt_sorted
        total = cum[-1] + nt_sorted[-1]
        if stage == "depth_sort":
            return (order[:4] + cum[:4]).astype(jnp.float32)
        bb_r = p.tile_bbox[order]
        gtab = jnp.stack([bb_r[:, 0], bb_r[:, 1],
                          jnp.maximum(bb_r[:, 2] - bb_r[:, 0], 1), cum], axis=0)
        slots = jnp.arange(CAP, dtype=jnp.int32)
        ranks_at_start = jnp.zeros(CAP, jnp.int32).at[cum].max(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        if stage == "mark":
            return (ranks_at_start[:4]).astype(jnp.float32)
        rank = jax.lax.associative_scan(jnp.maximum, ranks_at_start)
        rank = jnp.clip(rank, 0, N - 1)
        if stage == "cummax":
            return (rank[:4]).astype(jnp.float32)
        valid = slots < jnp.minimum(total, CAP)
        g4 = gtab[:, rank]
        k = slots - g4[3]
        bw = g4[2]
        tile = (g4[1] + k // bw) * TX + (g4[0] + k % bw)
        tile = jnp.where(valid, tile, num_tiles).astype(jnp.int32)
        if stage == "decode":
            return (tile[:4]).astype(jnp.float32)
        sorted_tile, sorted_rank = jax.lax.sort((tile, rank), num_keys=1, is_stable=True)
        if stage == "tile_sort":
            return (sorted_tile[:4] + sorted_rank[:4]).astype(jnp.float32)
        tids = jnp.arange(num_tiles, dtype=jnp.int32)
        tile_start = jnp.searchsorted(sorted_tile, tids, side="left").astype(jnp.int32)
        tile_end = jnp.searchsorted(sorted_tile, tids, side="right").astype(jnp.int32)
        tile_cnt = tile_end - tile_start
        if stage == "ranges":
            return (tile_start[:4] + tile_cnt[:4]).astype(jnp.float32)
        aligned_capacity = _aligned_capacity(CAP, num_tiles)
        aligned_cnt = ((tile_cnt + ALIGN - 1) // ALIGN) * ALIGN
        aligned_start = (jnp.cumsum(aligned_cnt) - aligned_cnt).astype(jnp.int32)
        delta = aligned_start - tile_start
        delta_fill = jax.lax.associative_scan(
            jnp.maximum, jnp.zeros(CAP, jnp.int32).at[tile_start].max(delta, mode="drop"))
        fwdmap = slots + delta_fill
        sorted_valid = slots < jnp.minimum(total, CAP)
        real_key = jnp.where(sorted_valid, fwdmap, _HUGE1 + slots)
        real_rank = jnp.where(sorted_valid, sorted_rank, N)
        j = jnp.arange(ALIGN, dtype=jnp.int32)[None, :]
        padcnt = (aligned_cnt - tile_cnt)[:, None]
        pad_key = jnp.where(j < padcnt, (aligned_start + tile_cnt)[:, None] + j,
                            _HUGE2 + tids[:, None] * ALIGN + j).reshape(-1)
        pad_rank = jnp.full(pad_key.shape, N, jnp.int32)
        _, aligned_rank = jax.lax.sort(
            (jnp.concatenate([real_key, pad_key]), jnp.concatenate([real_rank, pad_rank])),
            num_keys=1, is_stable=True)
        if stage == "aligned_sort":
            return (aligned_rank[:4]).astype(jnp.float32)
        raise ValueError(stage)

    return fn


def slope(fn, K_LO=5, K_HI=50):
    walls = {}
    for K in (K_LO, K_HI):
        @jax.jit
        def run(m0):
            def body(i, acc):
                return acc + fn(m0 + acc[0] * 1e-30)[:4] * 1e-6
            return jax.lax.fori_loop(0, K, body, jnp.zeros(4))
        jax.device_get(run(means))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(means))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


print(f"CAP={CAP} aligned={_aligned_capacity(CAP, num_tiles)}")
prev = 0.0
for st in ["depth_sort", "mark", "cummax", "decode", "tile_sort", "ranges", "aligned_sort"]:
    t = slope(upto(st))
    print(f"{st:>12}: {t:7.2f} ms  (+{t - prev:5.2f})")
    prev = t
