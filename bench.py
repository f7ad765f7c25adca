"""Benchmark: full differentiable render train-step (fwd+bwd) on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload = the BASELINE.md headline config on the HONEST product path: the
flagship model's train-time render (models/splat_model.render_model) — degree-3
SH eval with grads to the SH coefficients, sigmoid(opacities), exp(scales),
quat normalization, projection, binning, Pallas tile blend — plus the L1+SSIM
splatfacto loss, differentiated to all six parameter groups AND the screen-xy
densification statistic. This is the per-step work of the reference's finetune
phase (gc_trainer.py:257-281) and matches what gsplat's timed path includes
(gc_model.py:196-220: SH eval + activations + rasterize fwd/bwd).

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
from gaussctrl_exp_tpu.models.gaussians import GaussianParams, GaussianState, rgb_to_sh_dc
from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig, render_model
from gaussctrl_exp_tpu.ops.binning import (
    bin_gaussians,
    estimate_aligned_capacity,
    estimate_capacity,
)
from gaussctrl_exp_tpu.ops.projection import BLOCK, project_gaussians
from gaussctrl_exp_tpu.ops.renderer import RenderConfig
from gaussctrl_exp_tpu.ops.sh import num_sh_bases
from gaussctrl_exp_tpu.ops.ssim import splatfacto_loss

S = 512
K = 50
SH_DEGREE = 3
BASELINE_MPIX_S = 512 * 512 / 10e-3 / 1e6  # gsplat A5000-class: ~10 ms/frame

BEAR_PLY = Path("/root/reference/data/bear/sparse_pc.ply")


def _params(xyz, rgb, log_scales, seed):
    """Full degree-3 parameter set (non-zero rest coeffs so SH grads flow)."""
    n = xyz.shape[0]
    rng = np.random.default_rng(seed)
    K_sh = num_sh_bases(SH_DEGREE)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    fdc = np.asarray(rgb_to_sh_dc(jnp.asarray(rgb))).astype(np.float32)
    frest = (rng.normal(size=(n, K_sh - 1, 3)) * 0.05).astype(np.float32)
    opac_lin = rng.uniform(0.4, 0.9, (n, 1)).astype(np.float32)
    params = GaussianParams(
        means=jnp.asarray(xyz),
        scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.asarray(frest),
        opacities=jnp.asarray(np.log(opac_lin / (1 - opac_lin))),
    )
    return GaussianState(params, jnp.ones(n, bool))


def load_scene() -> GaussianState:
    if BEAR_PLY.exists():
        xyz, rgb = read_ply_points(BEAR_PLY)
        xyz = xyz / np.abs(xyz).max() * 2.0  # normalize like the dataparser
        n = xyz.shape[0]
        rng = np.random.default_rng(0)
        colors = (rgb.astype(np.float32) / 255.0) if rgb is not None else rng.uniform(0, 1, (n, 3))
        return _params(
            xyz.astype(np.float32), colors, np.full((n, 3), np.log(0.02), np.float32), 0
        )
    rng = np.random.default_rng(0)
    n = 35_000
    return _params(
        (rng.normal(size=(n, 3)) * 0.8).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32),
        (rng.normal(size=(n, 3)) * 0.5 - 4.2).astype(np.float32),
        0,
    )


def load_scene_high_n(n: int = 300_000) -> GaussianState:
    """Garden-scale high-N scene (BASELINE config 3): a trained-out 3DGS scene
    after densification runs at O(10⁵–10⁶) gaussians; no trained checkpoint
    ships in-repo, so this synthesizes a realistic high-N operating point
    (dense cloud, small anisotropic splats — post-densify statistics)."""
    rng = np.random.default_rng(7)
    return _params(
        (rng.normal(size=(n, 3)) * 1.2).astype(np.float32),
        rng.uniform(0, 1, (n, 3)).astype(np.float32),
        (rng.normal(size=(n, 3)) * 0.4 - 5.3).astype(np.float32),
        7,
    )


def roofline_blend_ms(n_isects: int, aligned_capacity: int, num_tiles: int,
                      n_chan: int = 3) -> dict:
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


def _pick_capacity(gs: GaussianState, cam):
    """Static capacity chosen like the trainer does: one host-side projection,
    estimate_capacity picks the bucket; if the scene outgrows the bucket,
    re-bucket (and say so — benchmark numbers at a grown capacity must be
    distinguishable) rather than kill the driver bench."""
    vm, pm, fm = camera_matrices(cam)
    p0 = jax.jit(
        lambda prm: project_gaussians(
            prm.means, jnp.exp(prm.scales), 1.0, prm.quats, vm, fm,
            cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=jax.nn.sigmoid(prm.opacities[:, 0]),
        )
    )(gs.params)
    cap = estimate_capacity(p0.num_tiles_hit, slack=1.08)
    n_isects = int(jax.device_get(jnp.sum(p0.num_tiles_hit)))
    if n_isects > cap:
        grown = cap
        while n_isects > grown:
            grown += 1 << 14
        print(f"# capacity re-bucketed: {cap} -> {grown} (n_isects {n_isects})",
              file=sys.stderr)
        cap = grown
    tx = (S + BLOCK - 1) // BLOCK
    acap = estimate_aligned_capacity(p0, tx, tx, cap)
    return cap, acap, n_isects


def bench_scene(gs: GaussianState, k_hi=K, roofline=False):
    cam = make_camera(
        look_at(np.array([0.0, -4.0, 0.0]), np.zeros(3)),
        fx=S * 1.05, fy=S * 1.05, cx=S / 2, cy=S / 2, width=S, height=S,
    )
    tx = ty = (S + BLOCK - 1) // BLOCK
    rng = np.random.default_rng(1)
    target = jnp.asarray(rng.uniform(0, 1, (S, S, 3)).astype(np.float32))
    background = jnp.ones(3)

    CAP, ACAP, n_isects = _pick_capacity(gs, cam)
    cfg = SplatModelConfig(
        sh_degree=SH_DEGREE,
        background_color="white",
        render=RenderConfig(impl="pallas", isect_capacity=CAP, aligned_capacity=ACAP),
    )
    alive = gs.alive
    step = jnp.int32(30 * cfg.sh_degree_interval)  # full-degree SH schedule

    def loss_fn(params: GaussianParams, xys_offset):
        out = render_model(
            GaussianState(params, alive), cam, step, cfg,
            training=True, background_override=background, xys_offset=xys_offset,
        )
        loss, _ = splatfacto_loss(out.rgb, target)
        return loss

    def train_grads(params):
        """The honest per-step device work: grads to all six param groups and
        the xys densification statistic (reference gc_trainer.py:257-281)."""
        xys_offset = jnp.zeros((params.capacity, 2))
        _, (pg, xg) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, xys_offset)
        # consume every grad leaf with a cheap full reduction (a reshape[:4]
        # probe makes XLA materialize a full reshape copy — measured 1.5 ms)
        acc = jnp.zeros((2, 2)) + jnp.sum(xg) + sum(jnp.sum(leaf) for leaf in pg)
        return acc

    def pre_blend(params):
        """Everything except the blend kernels: transforms + SH colors +
        project + bin, all outputs consumed (for roofline attribution:
        blend_ms ≈ full − pre_blend)."""
        from gaussctrl_exp_tpu.models.splat_model import model_colors

        vm, pm, fm = camera_matrices(cam)
        colors = model_colors(params, cam, step, cfg)
        p = project_gaussians(
            params.means, jnp.exp(params.scales), 1.0, params.quats, vm, fm,
            cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=jax.nn.sigmoid(params.opacities[:, 0]),
        )
        b = bin_gaussians(p, tx, ty, CAP, ACAP)
        return jnp.sum(
            (b.sorted_rank[:4] + b.aligned_gid[:4] + b.chunk_tile[:4]
             + b.chunk_base[:4] + b.cum[:4] + b.order[:4]).astype(jnp.float32)
        ) * 1e-6 + jnp.sum(colors[:2]) * 1e-9

    def slope(body_fn, k_hi_=k_hi):
        def make_run(K):
            @jax.jit
            def run(p0: GaussianParams):
                def body(i, carry):
                    p = p0._replace(means=p0.means + carry[:1, :1] * 1e-30)
                    return carry + body_fn(p)

                return jax.lax.fori_loop(0, K, body, jnp.zeros((2, 2)))

            return run

        walls = {}
        for Ki in (5, k_hi_):
            run = make_run(Ki)
            jax.device_get(run(gs.params))  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                jax.device_get(run(gs.params))
                best = min(best, time.time() - t0)
            walls[Ki] = best
        return (walls[k_hi_] - walls[5]) / (k_hi_ - 5) * 1e3

    def through_kernels(params):
        """pre_blend + fwd/bwd Pallas kernels with fixed cotangents, WITHOUT
        the slot→gaussian reduction: isolates the kernels proper so the
        roofline ratio compares like with like (the analytic bound models
        only the kernel streams, not the reduction machinery around them)."""
        from gaussctrl_exp_tpu.models.splat_model import model_colors
        from gaussctrl_exp_tpu.ops import blend_pallas as bp

        vm, pm, fm = camera_matrices(cam)
        colors = model_colors(params, cam, step, cfg)
        p = project_gaussians(
            params.means, jnp.exp(params.scales), 1.0, params.quats, vm, fm,
            cam.fx, cam.fy, cam.cx, cam.cy, S, S,
            opacities=jax.nn.sigmoid(params.opacities[:, 0]),
        )
        b = bin_gaussians(p, tx, ty, CAP, ACAP)
        ba = bp._bins_tuple(b)
        opacs = jax.nn.sigmoid(params.opacities[:, 0])
        (img, finalT), (vals, out_groups) = bp._blend_fwd_impl(
            p.xys, p.conics, colors, opacs, ba, S, S, CAP, ACAP, False
        )
        # bwd kernel with fixed cotangents, reduction skipped
        import functools as ft

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_chan = colors.shape[1]
        ns = ACAP // (bp.SUPER * bp.CHUNK)
        gout = bp._image_to_tiles(img * 0.5, finalT * 0.1, ty, tx, n_chan)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ns,),
            in_specs=[
                pl.BlockSpec((bp.NFIELD, bp.SUPER * bp.CHUNK),
                             lambda s, ct, cb, cc_: (0, s), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bp.GP, 16),
                             lambda s, ct, cb, cc_: (ct[s * bp.SUPER] // bp.GROUP, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bp.GP, 8),
                             lambda s, ct, cb, cc_: (ct[s * bp.SUPER] // bp.GROUP, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bp.NFIELD, bp.SUPER * bp.CHUNK),
                                   lambda s, ct, cb, cc_: (0, s), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bp.GP, 8), jnp.float32),
                            pltpu.SMEM((bp.GROUP,), jnp.int32)],
        )
        slot_grads = pl.pallas_call(
            ft.partial(bp._bwd_kernel, tiles_x=tx, n_chan=n_chan),
            out_shape=jax.ShapeDtypeStruct((bp.NFIELD, ACAP), jnp.float32),
            grid_spec=grid_spec,
        )(b.chunk_tile, b.chunk_base, b.chunk_cnt, vals, out_groups, gout)
        return jnp.full((2, 2), jnp.sum(slot_grads[:2, :4]) * 1e-6 + jnp.sum(img[:2, :2]) * 1e-9)

    ms = slope(lambda p: train_grads(p) * 1e-6)
    info = {"n_isects": n_isects, "capacity": CAP, "aligned_capacity": ACAP,
            "tiles": tx * ty}
    if roofline:
        pre_ms = slope(lambda p: jnp.full((2, 2), pre_blend(p)))
        kern_ms = slope(through_kernels)
        blend_ms = max(ms - pre_ms, 1e-3)
        kernels_ms = max(kern_ms - pre_ms, 1e-3)
        bound = roofline_blend_ms(n_isects, ACAP, tx * ty)
        info["roofline"] = {
            **bound,
            "kernels_fwd_bwd_ms": round(kernels_ms, 2),
            "vs_roofline_kernels": round(kernels_ms / bound["fwd_bwd_ms"], 2),
            "blend_stage_ms": round(blend_ms, 2),
            "vs_roofline_stage": round(blend_ms / bound["fwd_bwd_ms"], 2),
            "pre_blend_ms": round(pre_ms, 2),
        }
    return ms, info


def _retry(fn, attempts=3, label=""):
    """The axon relay occasionally drops a remote-compile mid-flight
    ('response body closed before all bytes were read'); compiles are cached
    server-side, so a retry after a transient flake is cheap. Never let a
    flake on a secondary config kill the whole bench output."""
    last = None
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — relay/transport errors
            last = e
            print(f"# bench retry {i + 1}/{attempts} for {label}: {type(e).__name__}: {e}",
                  file=sys.stderr)
            time.sleep(5)
    raise last


def main():
    import os

    fast = bool(os.environ.get("BENCH_FAST"))
    bear = load_scene()
    n_bear = bear.params.capacity
    ms_bear, info_bear = _retry(
        lambda: bench_scene(bear, roofline=not fast), label="bear"
    )
    mpix_s = S * S / (ms_bear / 1e3) / 1e6

    result = {
        "metric": (
            f"512x512 train-step render fwd+bwd (SH-3 + activations via "
            f"render_model), bear-scale ({n_bear} gaussians), 1 chip"
        ),
        "value": round(ms_bear, 2),
        "unit": "ms/frame",
        "vs_baseline": round(mpix_s / BASELINE_MPIX_S, 3),
    }
    if "roofline" in info_bear:
        result["roofline"] = info_bear["roofline"]

    # BASELINE config 3: garden-scale high-N (post-densify operating point).
    # Skippable for quick runs: BENCH_FAST=1 prints only the headline config.
    if not fast:
        try:
            garden = load_scene_high_n()
            ms_garden, info_garden = _retry(
                lambda: bench_scene(garden, k_hi=25, roofline=True), label="garden"
            )
            result["garden_high_n"] = {
                "gaussians": int(garden.params.capacity),
                "intersections": int(info_garden["n_isects"]),
                "ms_per_frame": round(ms_garden, 2),
                "mpix_s": round(S * S / (ms_garden / 1e3) / 1e6, 1),
                "roofline": info_garden["roofline"],
            }
        except Exception as e:  # noqa: BLE001 — never lose the headline line
            result["garden_high_n"] = {"error": f"{type(e).__name__}: {e}"[:300]}

    print(json.dumps(result))


if __name__ == "__main__":
    main()
