"""Slope-timed micro-bench of the blend-backward slot->gaussian reduction.

Isolates each piece of _blend_core_bwd's reduction at bear scale so the
round-4 optimization attacks the measured cost, not the guessed one:

  A. payload sort (key=aligned_rank + nrow grad rows) over aligned_capacity
  B. cumsum_rows over (nrow, capacity)
  C1. current boundary scheme: descriptor N-sort + ONE (nrow, 2N) gather
  C2. candidate: rank-order N-ends gather + shift-diff + small unsort gather
  D. nrow=9 variant of A (training drops the depth channel)

Usage: python scripts/bench_reduction_micro.py [N] [CAP]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.ops import binning as B
from gaussctrl_exp_tpu.ops.scan2d import cumsum_rows

N = int(sys.argv[1]) if len(sys.argv) > 1 else 35_000
CAP = int(sys.argv[2]) if len(sys.argv) > 2 else 212_992
TILES = 1024
ACAP = B._aligned_capacity(CAP, TILES)
K_LO, K_HI = 5, 25

rng = np.random.default_rng(0)
# synthetic but statistically faithful: ranks with ~5.4 slots/gaussian,
# pads (rank N) interspersed like the aligned layout (~40% at bear)
nt = rng.poisson(5.4, N).astype(np.int32)
ranks_real = np.repeat(np.arange(N, dtype=np.int32), nt)[: min(CAP, int(nt.sum()))]
n_real = ranks_real.shape[0]
aligned_rank_np = np.full(ACAP, N, np.int32)
pos = np.sort(rng.choice(ACAP, n_real, replace=False))
aligned_rank_np[pos] = np.sort(ranks_real)  # ascending like depth-rank order
aligned_rank = jnp.asarray(aligned_rank_np)
cum_np = np.concatenate([[0], np.cumsum(nt)[:-1]]).astype(np.int32)
cum = jnp.asarray(cum_np)
nt_j = jnp.asarray(nt)
order = jnp.asarray(rng.permutation(N).astype(np.int32))
slot_grads10 = jnp.asarray(rng.normal(size=(10, ACAP)).astype(np.float32))
sg_cap = jnp.asarray(rng.normal(size=(10, CAP)).astype(np.float32))
prefix_t = jnp.asarray(rng.normal(size=(10, CAP)).astype(np.float32))


def slope_time(stage_fn):
    walls = {}
    for K in (K_LO, K_HI):

        @jax.jit
        def run(x0):
            def body(i, acc):
                out = stage_fn(x0 + acc[:1, :1] * 1e-30)
                return acc + out.reshape(-1)[:4].reshape(2, 2).astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        jax.device_get(run(slot_grads10))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(slot_grads10))
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


def sort_nrow(sg, nrow):
    reordered = jax.lax.sort(
        (aligned_rank,) + tuple(sg[r] for r in range(nrow)), num_keys=1, is_stable=True
    )
    return jnp.stack(reordered[1:], axis=0)[:, :2]


def cumsum_only(sg):
    return cumsum_rows(sg[:, :CAP])[:, -2:]


def boundary_current(sg):
    prefix = prefix_t + sg[:1, :1, None][0] * 0
    hi_idx = jnp.clip(cum + nt_j - 1, 0, CAP - 1)
    _, hi_o, cum_o, nt_o = jax.lax.sort((order, hi_idx, cum, nt_j), num_keys=1, is_stable=True)
    lo_o = jnp.clip(cum_o - 1, 0, CAP - 1)
    both = jnp.concatenate([hi_o, lo_o])
    vals2 = prefix[:, both]
    hi = vals2[:, :N]
    lo = jnp.where((cum_o > 0)[None, :], vals2[:, N:], 0.0)
    return jnp.where((nt_o > 0)[None, :], hi - lo, 0.0)[:, :2]


INV = jnp.asarray(np.argsort(rng.permutation(N)).astype(np.int32))


def boundary_ends(sg):
    """N ascending end-positions gather + shift diff + small unsort gather."""
    prefix = prefix_t + sg[:1, :1, None][0] * 0
    hi_idx = jnp.clip(cum + nt_j - 1, 0, CAP - 1)  # ascending in rank order
    ends = prefix[:, hi_idx]  # (nrow, N) gather at ascending positions
    g_rank = ends - jnp.pad(ends[:, :-1], ((0, 0), (1, 0)))
    g_rank = jnp.where((nt_j > 0)[None, :], g_rank, 0.0)
    return g_rank[:, INV][:, :2]  # small-table unsort gather


if __name__ == "__main__":
    print(f"N={N} CAP={CAP} ACAP={ACAP} n_real={n_real} — slope-timed ms")
    for name, fn in [
        ("A  sort 10 payload rows", lambda sg: sort_nrow(sg, 10)),
        ("D  sort 9 payload rows", lambda sg: sort_nrow(sg, 9)),
        ("B  cumsum_rows (10,CAP)", cumsum_only),
        ("C1 boundary: desc-sort + 2N-gather", boundary_current),
        ("C2 boundary: N-ends + shift + unsort", boundary_ends),
    ]:
        print(f"{name}: {slope_time(fn):8.3f}")
