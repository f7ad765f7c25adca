"""Stage-level device-time benchmark (relay-proof).

The axon relay memoizes identical executions and adds per-call overhead, so
wall-clock around repeated `f(x)` calls lies in both directions. This harness
times K iterations of the stage INSIDE one jit (fori_loop, input perturbed per
iteration, output carried) — one dispatch, real device time.

Usage: python scripts/bench_stages.py [N] [S] [iters]
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
K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
CAP = 1 << 18
TX = TY = (S + 15) // 16

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


def timed_loop(stage_fn, out_example):
    """stage_fn(means_perturbed) -> array; loops K times inside one jit."""

    @jax.jit
    def run(m0):
        def body(i, carry):
            # perturb input with the carry so iterations can't be elided/reordered
            m = m0 + (carry[0, 0] * 1e-12 + i * 1e-9)
            out = stage_fn(m)
            return out.astype(jnp.float32)

        return jax.lax.fori_loop(0, K, body, jnp.zeros_like(out_example))

    jax.block_until_ready(run(means))  # compile
    t = time.time()
    jax.block_until_ready(run(means))
    return (time.time() - t) / K * 1e3


def stage_proj(m):
    p = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
    return p.xys


def stage_bins(m):
    p = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
    b = bin_gaussians(p, TX, TY, CAP)
    return b.sorted_rank[:N].astype(jnp.float32).reshape(-1, 1) * jnp.ones((1, 2))


def stage_full(m):
    p = project_gaussians(m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
    b = bin_gaussians(p, TX, TY, CAP)
    o = b.order
    out = rasterize_tiles_pallas(p.xys[o], p.conics[o], colors[o], opacs[o], b, S, S)
    return out.img[:, :, :2].reshape(-1, 2)[:N]


def stage_fwd_bwd(m):
    def loss_fn(mm):
        p = project_gaussians(mm, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S)
        b = bin_gaussians(p, TX, TY, CAP)
        o = b.order
        out = rasterize_tiles_pallas(p.xys[o], p.conics[o], colors[o], opacs[o], b, S, S)
        rgb = jnp.minimum(out.img[:, :, :3], 1.0)
        loss, _ = splatfacto_loss(rgb, target)
        return loss

    return jax.grad(loss_fn)(m)[:, :2]


if __name__ == "__main__":
    ex2 = jnp.zeros((N, 2))
    print(f"N={N} S={S} iters={K} (device-time per iteration)")
    print(f"projection:      {timed_loop(stage_proj, ex2):8.2f} ms")
    print(f"+ binning:       {timed_loop(stage_bins, ex2):8.2f} ms")
    print(f"+ blend (fwd):   {timed_loop(stage_full, ex2):8.2f} ms")
    print(f"full fwd+bwd:    {timed_loop(stage_fwd_bwd, ex2):8.2f} ms")
