"""Binning decode variants + new group/superstep blend re-baseline.

The micro breakdown showed the slot→(rank, tile) decode (scatter-mark +
associative_scan cummax over capacity + small gather) costs ~2.3 ms of the
~3.5 ms binning total at CAP=262k. Variants:

  cur_bins    — production bin_gaussians (group/superstep layout)
  lax_cummax  — associative_scan(maximum) → jax.lax.cummax primitive
  blocked     — cummax via reshape(., 128) + 7 lane-shift maxes + row carry
  mergesort   — decode via ONE sort (merge cum-starts with slots): no
                scatter, no scan for the rank fill
  fwd         — new group/superstep pallas fwd (incl. binning)
  fwdbwd      — full fwd+bwd (incl. binning)

Usage: python scripts/bench_binning_variants.py [N] [S]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops.binning import bin_gaussians
from gaussctrl_exp_tpu.ops.blend_pallas import rasterize_tiles_pallas
from gaussctrl_exp_tpu.ops.projection import project_gaussians
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

N = int(sys.argv[1]) if len(sys.argv) > 1 else 35_000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
CAP = int(sys.argv[3]) if len(sys.argv) > 3 else 1 << 18
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
target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))


def _proj(m):
    return project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)


def _prep(m):
    p = _proj(m)
    depth_key = jnp.where(p.mask, p.depths, jnp.inf)
    order = jnp.argsort(depth_key)
    nt_sorted = p.num_tiles_hit[order]
    cum = jnp.cumsum(nt_sorted) - nt_sorted
    return p, order, nt_sorted, cum


def blocked_cummax(x):
    n = x.shape[0]
    if n <= 2048 or n % 128:
        return jax.lax.associative_scan(jnp.maximum, x)
    C = 128
    rows = n // C
    m = x.reshape(rows, C)
    sh = 1
    while sh < C:
        shifted = jnp.pad(m, ((0, 0), (sh, 0)), constant_values=np.iinfo(np.int32).min)[:, :C]
        m = jnp.maximum(m, shifted)
        sh *= 2
    carry_in = blocked_cummax(m[:, -1])  # inclusive row totals
    carry_excl = jnp.pad(carry_in, (1, 0), constant_values=np.iinfo(np.int32).min)[:-1]
    return jnp.maximum(m, carry_excl[:, None]).reshape(n)


def decode_current(m):
    p, order, nt_sorted, cum = _prep(m)
    ranks_at_start = jnp.zeros(CAP, jnp.int32).at[cum].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    rank = jax.lax.associative_scan(jnp.maximum, ranks_at_start)
    return rank[:4].astype(jnp.float32) + cum[:4]


def decode_lax_cummax(m):
    p, order, nt_sorted, cum = _prep(m)
    ranks_at_start = jnp.zeros(CAP, jnp.int32).at[cum].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    rank = jax.lax.cummax(ranks_at_start)
    return rank[:4].astype(jnp.float32) + cum[:4]


def decode_blocked(m):
    p, order, nt_sorted, cum = _prep(m)
    ranks_at_start = jnp.zeros(CAP, jnp.int32).at[cum].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    rank = blocked_cummax(ranks_at_start)
    return rank[:4].astype(jnp.float32) + cum[:4]


def decode_mergesort(m):
    """rank[slot] = #cum-starts ≤ slot − 1, via one merged sort: keys =
    [2·cum, 2·slot+1]; after sorting, rank at a slot entry = (#starts before
    it) − 1 = (position − slot) − 1; slot entries come out in slot order, so
    compress-by-sort on an is_start flag recovers per-slot ranks."""
    p, order, nt_sorted, cum = _prep(m)
    slots = jnp.arange(CAP, dtype=jnp.int32)
    keys = jnp.concatenate([cum * 2, slots * 2 + 1])
    flags = jnp.concatenate([jnp.ones(N, jnp.int32), jnp.zeros(CAP, jnp.int32)])
    skeys, sflags = jax.lax.sort((keys, flags), num_keys=1, is_stable=True)
    nstart = jnp.cumsum(sflags)  # #starts up to and incl. position
    rank_at_pos = nstart - 1
    # compress: slot entries (flag 0) in slot order → sort by (flag, seq)
    seq = jnp.arange(N + CAP, dtype=jnp.int32)
    _, _, rank_sorted = jax.lax.sort((sflags, seq, rank_at_pos), num_keys=2, is_stable=True)
    rank = rank_sorted[:CAP]
    return rank[:4].astype(jnp.float32) + cum[:4]


def cur_bins(m):
    p = _proj(m)
    b = bin_gaussians(p, TX, TY, CAP)
    return (
        b.sorted_rank[:4] + b.aligned_gid[:4] + b.chunk_tile[:4] + b.chunk_base[:4]
        + b.chunk_cnt[:4] + b.cum[:4] + b.nt_sorted[:4] + b.order[:4]
        + b.tile_start[:4] + b.tile_cnt[:4]
    ).astype(jnp.float32)


def fwd(m):
    p = _proj(m)
    b = bin_gaussians(p, TX, TY, CAP)
    out = rasterize_tiles_pallas(p.xys, p.conics, colors, opacs, b, S, S)
    return out.img[:2, :2, 0] + out.final_T[:2, :2]


def fwdbwd(m):
    def f(mm):
        p = _proj(mm)
        b = bin_gaussians(p, TX, TY, CAP)
        out = rasterize_tiles_pallas(p.xys, p.conics, colors, opacs, b, S, S)
        rgb = jnp.minimum(out.img[:, :, :3], 1.0)
        loss, _ = splatfacto_loss(rgb, target)
        return loss

    return jax.grad(f)(m)[:2, :2]


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


# --- primitive isolation (appended round 3): where does decode time go? ---

def prim_prep_only(m):
    p, order, nt_sorted, cum = _prep(m)
    return (cum[:4] + nt_sorted[:4] + order[:4]).astype(jnp.float32)


def prim_prep_sortpayload(m):
    """depth sort carrying payloads in the sort itself (no post-gathers)."""
    p = _proj(m)
    depth_key = jnp.where(p.mask, p.depths, jnp.inf)
    iota = jnp.arange(N, dtype=jnp.int32)
    _, order, nt_sorted, bb0, bb1, bb2, bb3 = jax.lax.sort(
        (depth_key, iota, p.num_tiles_hit, p.tile_bbox[:, 0], p.tile_bbox[:, 1],
         p.tile_bbox[:, 2], p.tile_bbox[:, 3]),
        num_keys=1, is_stable=True,
    )
    cum = jnp.cumsum(nt_sorted) - nt_sorted
    return (cum[:4] + bb0[:4] + order[:4]).astype(jnp.float32)


def prim_scatter_only(m):
    p, order, nt_sorted, cum = _prep(m)
    ras = jnp.zeros(CAP, jnp.int32).at[cum].max(
        jnp.arange(N, dtype=jnp.int32), mode="drop"
    )
    return ras[:4].astype(jnp.float32) + cum[:4]


def prim_cummax_only(m):
    p, order, nt_sorted, cum = _prep(m)
    from gaussctrl_exp_tpu.ops.scan2d import cummax1d
    x = jnp.zeros(CAP, jnp.int32).at[0].set(cum[0])
    return cummax1d(x)[:4].astype(jnp.float32)


def prim_gather2_only(m):
    p, order, nt_sorted, cum = _prep(m)
    gtab = jnp.stack([cum, nt_sorted], axis=0)  # (2, N)
    idx = jnp.clip(jnp.arange(CAP, dtype=jnp.int32) % N, 0, N - 1)
    g2 = gtab[:, idx]
    return g2[0, :4].astype(jnp.float32)


def prim_sort_cap_2i32(m):
    p, order, nt_sorted, cum = _prep(m)
    k = jnp.arange(CAP, dtype=jnp.int32) ^ 12345
    v = jnp.arange(CAP, dtype=jnp.int32)
    sk, sv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    return (sk[:4] + sv[:4] + cum[:1]).astype(jnp.float32)


def prim_sort_cap_1i32(m):
    p, order, nt_sorted, cum = _prep(m)
    k = jnp.arange(CAP, dtype=jnp.int32) ^ 12345
    sk = jax.lax.sort(k)
    return (sk[:4] + cum[:1]).astype(jnp.float32)


EXTRA = [
    ("prep(gathers)", prim_prep_only),
    ("prep(sortpayl)", prim_prep_sortpayload),
    ("scatter_marks", prim_scatter_only),
    ("cummax_cap", prim_cummax_only),
    ("gather2_cap", prim_gather2_only),
    ("sort_cap_2i32", prim_sort_cap_2i32),
    ("sort_cap_1i32", prim_sort_cap_1i32),
]


if __name__ == "__main__":
    # correctness cross-check of the decode variants on device first
    a = jax.jit(decode_current)(means)
    for name, fn in (("lax", decode_lax_cummax), ("blocked", decode_blocked),
                     ("merge", decode_mergesort)):
        b = jax.jit(fn)(means)
        ok = bool(jnp.allclose(a, b))
        print(f"decode {name} matches: {ok}", flush=True)
    print(f"N={N} S={S} CAP={CAP} — slope ms", flush=True)
    for name, fn in (
        ("decode_current", decode_current),
        ("decode_laxcmax", decode_lax_cummax),
        ("decode_blocked", decode_blocked),
        ("decode_merge", decode_mergesort),
        *EXTRA,
        ("cur_bins", cur_bins),
        ("fwd", fwd),
        ("fwdbwd", fwdbwd),
    ):
        try:
            print(f"{name:16s} {slope_time(fn):8.2f} ms", flush=True)
        except Exception as e:  # noqa
            print(f"{name:16s} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)
