"""Benchmark: full differentiable render train-step (fwd+bwd) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the BASELINE.md headline config: bear-scale scene (~35k gaussians,
the bundled bear ply is 34,174 points), one 512×512 camera, forward render +
full backward through projection/SH/binning/blend + L1+SSIM loss (the per-step
work of the reference's finetune phase, gc_trainer.py:257-281).

vs_baseline compares against the reference stack's rasterize fwd+bwd on its
tested hardware (gsplat v0.1.2 on an RTX A5000, README.md:53-58): no number is
published in-repo (BASELINE.md "published: none"), so we use 10 ms/frame — a
mid-range measured figure for gsplat 0.1.x full fwd+bwd at 512² / ~35k
gaussians on A5000-class GPUs — i.e. 26.2 Mpix/s. vs_baseline = ours / that.

Timing is relay-proof AND overhead-proof: the axon relay adds ~30 ms fixed
per-dispatch overhead, so the reported time is the SLOPE between a 5- and a
50-iteration fori_loop (one jit each, input perturbed via the carried value so
iterations can't be elided), with the result fetched to host. See
scripts/bench_stages.py for the methodology notes.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

from gaussctrl_exp_tpu.cameras import camera_matrices, look_at, make_camera
from gaussctrl_exp_tpu.data.ply import read_ply_points
from gaussctrl_exp_tpu.ops.binning import bin_gaussians, estimate_capacity
from gaussctrl_exp_tpu.ops.blend_pallas import rasterize_tiles_pallas
from gaussctrl_exp_tpu.ops.projection import BLOCK, project_gaussians
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

S = 512
K = 50
BASELINE_MPIX_S = 512 * 512 / 10e-3 / 1e6  # gsplat A5000-class: ~10 ms/frame

BEAR_PLY = Path("/root/reference/data/bear/sparse_pc.ply")


def load_scene():
    if BEAR_PLY.exists():
        xyz, rgb = read_ply_points(BEAR_PLY)
        xyz = xyz / np.abs(xyz).max()  # normalize like the dataparser
        n = xyz.shape[0]
        rng = np.random.default_rng(0)
        colors = (rgb.astype(np.float32) / 255.0) if rgb is not None else rng.uniform(0, 1, (n, 3))
        return (
            jnp.asarray(xyz * 2.0),
            jnp.asarray(np.full((n, 3), 0.02, np.float32)),
            jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
            jnp.asarray(np.concatenate([colors, np.zeros((n, 1), np.float32)], 1)),
            jnp.asarray(rng.uniform(0.4, 0.9, n).astype(np.float32)),
        )
    rng = np.random.default_rng(0)
    n = 35_000
    return (
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 0.8),
        jnp.asarray(np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.5 - 4.2)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.4, 0.9, n).astype(np.float32)),
    )


def load_scene_high_n(n: int = 300_000):
    """Garden-scale high-N scene (BASELINE config 3): a trained-out 3DGS scene
    after densification runs at O(10⁵–10⁶) gaussians; no trained checkpoint
    ships in-repo, so this synthesizes a realistic high-N operating point
    (dense cloud, small anisotropic splats — post-densify statistics)."""
    rng = np.random.default_rng(7)
    return (
        jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 1.2),
        jnp.asarray(np.exp(rng.normal(size=(n, 3)).astype(np.float32) * 0.4 - 5.3)),
        jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 1, (n, 4)).astype(np.float32)),
        jnp.asarray(rng.uniform(0.3, 0.9, n).astype(np.float32)),
    )


def bench_scene(scene, k_hi=K):
    means, scales, quats, chan, opacs = scene
    cam = make_camera(
        look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
        fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S,
    )
    vm, pm, fm = camera_matrices(cam)
    tx = ty = (S + BLOCK - 1) // BLOCK
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))

    # static capacity chosen like the trainer does: one host-side projection,
    # estimate_capacity picks the bucket (slack covers the per-step drift)
    p0 = jax.jit(
        lambda m: project_gaussians(
            m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=opacs,
        )
    )(means)
    CAP = estimate_capacity(p0.num_tiles_hit, slack=1.08)
    n_isects = int(jax.device_get(jnp.sum(p0.num_tiles_hit)))
    assert n_isects <= CAP, (n_isects, CAP)

    def loss_fn(m):
        p = project_gaussians(
            m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=opacs,
        )
        b = bin_gaussians(p, tx, ty, CAP)
        out = rasterize_tiles_pallas(p.xys, p.conics, chan, opacs, b, S, S)
        rgb = jnp.minimum(out.img[:, :, :3], 1.0)
        loss, _ = splatfacto_loss(rgb, target)
        return loss

    def make_run(K):
        @jax.jit
        def run(m0):
            def body(i, carry):
                m = m0 + carry[:1, :1] * 1e-30
                return carry + jax.grad(loss_fn)(m)[:2, :2] * 1e-6

            return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

        return run

    walls = {}
    for Ki in (5, k_hi):
        run = make_run(Ki)
        jax.device_get(run(means))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.device_get(run(means))
            best = min(best, time.time() - t0)
        walls[Ki] = best
    return (walls[k_hi] - walls[5]) / (k_hi - 5) * 1e3, n_isects


def main():
    import os

    bear = load_scene()
    n_bear = bear[0].shape[0]
    ms_bear, isects_bear = bench_scene(bear)
    mpix_s = S * S / (ms_bear / 1e3) / 1e6

    result = {
        "metric": f"512x512 render fwd+bwd, bear-scale ({n_bear} gaussians), 1 chip",
        "value": round(ms_bear, 2),
        "unit": "ms/frame",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }

    # BASELINE config 3: garden-scale high-N (post-densify operating point).
    # Skippable for quick runs: BENCH_FAST=1 prints only the headline config.
    if not os.environ.get("BENCH_FAST"):
        garden = load_scene_high_n()
        ms_garden, isects_garden = bench_scene(garden, k_hi=25)
        result["garden_high_n"] = {
            "gaussians": int(garden[0].shape[0]),
            "intersections": int(isects_garden),
            "ms_per_frame": round(ms_garden, 2),
            "mpix_s": round(S * S / (ms_garden / 1e3) / 1e6, 1),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
