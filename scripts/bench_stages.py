"""Stage-level device-time benchmark (relay-proof, slope-timed).

Two sources of lies on this setup, both defeated here:

  * the axon relay adds a large fixed per-dispatch overhead (~30 ms RTT) and
    `block_until_ready` does not reliably block for small outputs — so each
    measurement fetches the result to host and the reported time is the SLOPE
    between a K_LO- and K_HI-iteration fori_loop (fixed overhead cancels);
  * XLA dead-code-eliminates whatever a stage doesn't consume — so every
    stage consumes ALL of its outputs (a few lanes of each array), otherwise
    "binning" quietly excludes the index machinery that the blend stage pays
    for.

Usage: python scripts/bench_stages.py [N] [S]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.ops.binning import bin_gaussians, estimate_capacity
from gaussctrl_exp_tpu.ops.blend_pallas import rasterize_tiles_pallas
from gaussctrl_exp_tpu.ops.projection import BLOCK, project_gaussians
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

N = int(sys.argv[1]) if len(sys.argv) > 1 else 35_000
S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
TX = TY = (S + BLOCK - 1) // BLOCK
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

_p0 = jax.jit(
    lambda m: project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S, opacities=opacs)
)(means)
CAP = estimate_capacity(_p0.num_tiles_hit, slack=1.08)
print(f"tile={BLOCK} capacity bucket: {CAP} (isects {int(jax.device_get(jnp.sum(_p0.num_tiles_hit)))})", flush=True)


def slope_time(stage_fn):
    """stage_fn(means) -> (2,2)-ish array. Returns ms/iteration."""
    walls = {}
    for K in (K_LO, K_HI):

        @jax.jit
        def run(m0):
            def body(i, acc):
                out = stage_fn(m0 + acc[:1, :1] * 1e-30)
                return acc + out.reshape(-1)[:4].reshape(2, 2).astype(jnp.float32) * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        jax.device_get(run(means))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(means))  # device_get forces a real fetch
            best = min(best, time.time() - t0)
        walls[K] = best
    return (walls[K_HI] - walls[K_LO]) / (K_HI - K_LO) * 1e3


def stage_proj(m):
    p = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S, opacities=opacs)
    return p.xys[:2, :2] + p.conics[:2, :2] + p.depths[:2, None]


def stage_bins(m):
    p = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S, opacities=opacs)
    b = bin_gaussians(p, TX, TY, CAP)
    # consume every output so nothing is DCE'd into a later stage
    return (
        b.sorted_rank[:4] + b.aligned_gid[:4] + b.chunk_tile[:4] + b.chunk_base[:4]
        + b.chunk_cnt[:4] + b.cum[:4] + b.nt_sorted[:4] + b.order[:4]
        + b.tile_start[:4] + b.tile_cnt[:4]
    ).astype(jnp.float32)


def stage_fwd(m):
    p = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S, opacities=opacs)
    b = bin_gaussians(p, TX, TY, CAP)
    out = rasterize_tiles_pallas(p.xys, p.conics, colors, opacs, b, S, S)
    return out.img[:2, :2, 0] + out.final_T[:2, :2]


def stage_fwd_bwd(m):
    def loss_fn(mm):
        p = project_gaussians(mm, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S, opacities=opacs)
        b = bin_gaussians(p, TX, TY, CAP)
        out = rasterize_tiles_pallas(p.xys, p.conics, colors, opacs, b, S, S)
        rgb = jnp.minimum(out.img[:, :, :3], 1.0)
        loss, _ = splatfacto_loss(rgb, target)
        return loss

    return jax.grad(loss_fn)(m)[:2, :2]


if __name__ == "__main__":
    print(f"N={N} S={S} slope-timed ms/iteration (K={K_LO}->{K_HI})")
    print(f"projection:      {slope_time(stage_proj):8.2f} ms")
    print(f"+ binning:       {slope_time(stage_bins):8.2f} ms")
    print(f"+ blend (fwd):   {slope_time(stage_fwd):8.2f} ms")
    print(f"full fwd+bwd:    {slope_time(stage_fwd_bwd):8.2f} ms")
