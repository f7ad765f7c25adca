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


def roofline_blend_ms(n_isects: int, aligned_capacity: int, num_tiles: int,
                      n_chan: int = 4) -> dict:
    """Analytic speed-of-light bound for the blend fwd+bwd Pallas kernels on
    one v5e chip (BASELINE.md "within 1.2× roofline" target).

    Streams/compute counted straight from ops/blend_pallas.py:
      fwd: (NFIELD, aligned) field stream in; (GP,16) group blocks resident in
           VMEM, written back once per group; per ACTIVE chunk one (P,C)×(C,C)
           transmittance matmul (exp(L@U)) + ~55 VPU ops per (P·CHUNK) element.
      bwd: field stream + residual/cotangent group blocks in, (NFIELD, aligned)
           slot-grad stream out; two triangular matmuls + 2 small matmuls and
           ~75 VPU ops per element per active chunk.
    Active chunks ≈ n_isects/128 + num_tiles/2 (half-chunk padding waste).

    v5e peaks assumed (public figures): HBM 819 GB/s; MXU 197 bf16 TFLOP/s,
    f32 inputs ≈ 1/4 → 49 TFLOP/s; VPU 8×128 lanes × 4 ops × 0.94 GHz ≈
    3.85 TFLOP/s (transcendentals counted as 8 ops in the op tallies). The
    bound per pass is max(HBM, MXU, VPU) — resources overlap.
    """
    HBM, MXU_F32, VPU = 819e9, 49.2e12, 3.85e12
    P_, C_ = 256, 128
    na = n_isects / C_ + num_tiles / 2  # active chunks
    ac = aligned_capacity
    gp_bytes = num_tiles * P_ * 16 * 4  # all group blocks, one visit each

    fwd_bytes = 16 * ac * 4 + 2 * gp_bytes
    fwd_mxu = na * (2 * P_ * C_ * C_ + 2 * P_ * C_ * n_chan)
    fwd_vpu = na * 55 * P_ * C_
    fwd_ms = max(fwd_bytes / HBM, fwd_mxu / MXU_F32, fwd_vpu / VPU) * 1e3

    bwd_bytes = 16 * ac * 4 * 2 + 3 * gp_bytes  # fields in + grads out + res/gout/state
    bwd_mxu = na * (2 * 2 * P_ * C_ * C_ + 2 * 2 * P_ * C_ * n_chan)
    bwd_vpu = na * 75 * P_ * C_
    bwd_ms = max(bwd_bytes / HBM, bwd_mxu / MXU_F32, bwd_vpu / VPU) * 1e3
    return {
        "fwd_ms": round(fwd_ms, 3),
        "bwd_ms": round(bwd_ms, 3),
        "fwd_bwd_ms": round(fwd_ms + bwd_ms, 3),
    }


def bench_scene(scene, k_hi=K, roofline=False):
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
    # estimate_capacity picks the bucket (slack covers the per-step drift);
    # if a scene/camera tweak ever outgrows the bucket, re-bucket rather than
    # kill the driver bench
    p0 = jax.jit(
        lambda m: project_gaussians(
            m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=opacs,
        )
    )(means)
    CAP = estimate_capacity(p0.num_tiles_hit, slack=1.08)
    n_isects = int(jax.device_get(jnp.sum(p0.num_tiles_hit)))
    while n_isects > CAP:
        CAP += 1 << 14

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

    def pre_blend(m):
        """Everything except the blend kernels: project + bin, all outputs
        consumed (for roofline attribution: blend_ms ≈ full − pre_blend)."""
        p = project_gaussians(
            m, scales, 1.0, quats, vm, fm, cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=opacs,
        )
        b = bin_gaussians(p, tx, ty, CAP)
        return jnp.sum(
            (b.sorted_rank[:4] + b.aligned_rank[:4] + b.chunk_tile[:4]
             + b.chunk_base[:4] + b.cum[:4] + b.order[:4]).astype(jnp.float32)
        ) * 1e-6

    def slope(body_fn, k_hi_=k_hi):
        def make_run(K):
            @jax.jit
            def run(m0):
                def body(i, carry):
                    m = m0 + carry[:1, :1] * 1e-30
                    return carry + body_fn(m)

                return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

            return run

        walls = {}
        for Ki in (5, k_hi_):
            run = make_run(Ki)
            jax.device_get(run(means))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                jax.device_get(run(means))
                best = min(best, time.time() - t0)
            walls[Ki] = best
        return (walls[k_hi_] - walls[5]) / (k_hi_ - 5) * 1e3

    ms = slope(lambda m: jax.grad(loss_fn)(m)[:2, :2] * 1e-6)
    info = {"n_isects": n_isects, "capacity": CAP, "tiles": tx * ty}
    if roofline:
        from gaussctrl_exp_tpu.ops.binning import _aligned_capacity

        pre_ms = slope(lambda m: jnp.full((2, 2), pre_blend(m)))
        blend_ms = max(ms - pre_ms, 1e-3)
        bound = roofline_blend_ms(n_isects, _aligned_capacity(CAP, tx * ty), tx * ty)
        info["roofline"] = {
            **bound,
            "measured_blend_fwd_bwd_ms": round(blend_ms, 2),
            "pre_blend_ms": round(pre_ms, 2),
            "vs_roofline": round(blend_ms / bound["fwd_bwd_ms"], 2),
        }
    return ms, info


def main():
    import os

    fast = bool(os.environ.get("BENCH_FAST"))
    bear = load_scene()
    n_bear = bear[0].shape[0]
    ms_bear, info_bear = bench_scene(bear, roofline=not fast)
    mpix_s = S * S / (ms_bear / 1e3) / 1e6

    result = {
        "metric": f"512x512 render fwd+bwd, bear-scale ({n_bear} gaussians), 1 chip",
        "value": round(ms_bear, 2),
        "unit": "ms/frame",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }
    if "roofline" in info_bear:
        result["roofline"] = info_bear["roofline"]

    # BASELINE config 3: garden-scale high-N (post-densify operating point).
    # Skippable for quick runs: BENCH_FAST=1 prints only the headline config.
    if not fast:
        garden = load_scene_high_n()
        ms_garden, info_garden = bench_scene(garden, k_hi=25)
        result["garden_high_n"] = {
            "gaussians": int(garden[0].shape[0]),
            "intersections": int(info_garden["n_isects"]),
            "ms_per_frame": round(ms_garden, 2),
            "mpix_s": round(S * S / (ms_garden / 1e3) / 1e6, 1),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
