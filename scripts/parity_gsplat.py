"""Numerical-parity harness vs gsplat v0.1.x (the reference rasterizer).

BASELINE.md axis: "pixel- and gradient-allclose vs gsplat v0.1.x rasterizer"
on the bundled bear/garden/face scenes. No GPU exists in the build
environment, so the gsplat leg cannot RUN here — this harness makes the axis
*executable the day one does*, and meanwhile supports a golden-file protocol:

  report  : render the scene through THIS stack and (when ``gsplat`` +
            ``torch.cuda`` are importable) through gsplat v0.1.x with the
            reference's exact call shape (gc_model.py:174-236: project at
            BLOCK 16, f32, clip 0.01; rasterize rgb / depth-channel / alpha),
            then print per-output max-abs / max-rel deltas and an allclose
            verdict for outputs AND loss gradients.
  capture : render through whichever stack is available and write a .npz
            golden (outputs + grads + the deterministic scene recipe hash).
            Run this once on a GPU machine with gsplat to mint reference
            goldens; run here to mint TPU goldens.
  check   : render through this stack and compare against a committed golden
            .npz (either origin) at the given tolerance.

The scene recipe is fully deterministic (seeded from the scene name) so the
two stacks — run on different machines at different times — construct
bit-identical inputs: real cameras from the scene's transforms.json (first
``--views`` of the sorted train split), gaussians seeded from sparse_pc.ply
exactly like the dataparser does, fixed activations.

Usage:
  python scripts/parity_gsplat.py --scene bear --mode report
  python scripts/parity_gsplat.py --scene bear --mode capture --out goldens/
  python scripts/parity_gsplat.py --scene bear --mode check --golden goldens/bear.npz
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

REFERENCE_DATA = Path("/root/reference/data")
SH_DEGREE = 3
DEFAULT_TOL = dict(rgb_abs=1e-4, depth_rel=1e-3, alpha_abs=1e-4, grad_rel=5e-3)


# ---------------------------------------------------------------- scene recipe
def build_scene(scene: str, n_views: int):
    """Deterministic (scene, cameras, gaussian params) both stacks agree on."""
    from gaussctrl_exp_tpu.data.dataparser import DataParserConfig, load_scene

    out = load_scene(DataParserConfig(data=str(REFERENCE_DATA / scene)), split="train")
    cams = out.cameras
    views = list(range(min(n_views, cams.c2w.shape[0])))

    xyz = np.asarray(out.points_xyz, np.float32)
    rgb = (
        np.asarray(out.points_rgb, np.float32) / 255.0
        if out.points_rgb is not None
        else np.full((xyz.shape[0], 3), 0.5, np.float32)
    )
    n = xyz.shape[0]
    rng = np.random.default_rng(abs(hash(scene)) % (1 << 31))
    # splatfacto-style init: log-scale from a fixed percentile of the cloud
    # extent, random unit-ish quats, mid opacities, SH dc from colors
    scale0 = float(np.percentile(np.linalg.norm(xyz - xyz.mean(0), axis=1), 50)) / 50.0
    log_scales = np.log(np.full((n, 3), max(scale0, 1e-3), np.float32))
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac_logit = np.full((n, 1), 0.0, np.float32)  # sigmoid → 0.5
    f_rest = (rng.normal(size=(n, 15, 3)) * 0.02).astype(np.float32)
    target_seed = rng.integers(0, 1 << 31)
    return dict(
        views=views,
        c2w=cams.c2w[views],
        fx=cams.fx[views], fy=cams.fy[views],
        cx=cams.cx[views], cy=cams.cy[views],
        width=int(cams.width), height=int(cams.height),
        xyz=xyz, rgb=rgb, log_scales=log_scales, quats=quats,
        opac_logit=opac_logit, f_rest=f_rest, target_seed=int(target_seed),
    )


# ---------------------------------------------------------------- this stack
def run_ours(sc: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from gaussctrl_exp_tpu.cameras import make_camera
    from gaussctrl_exp_tpu.models.gaussians import (
        GaussianParams,
        GaussianState,
        rgb_to_sh_dc,
    )
    from gaussctrl_exp_tpu.models.splat_model import SplatModelConfig, render_model
    from gaussctrl_exp_tpu.ops.renderer import RenderConfig

    H, W = sc["height"], sc["width"]
    n = sc["xyz"].shape[0]
    params = GaussianParams(
        means=jnp.asarray(sc["xyz"]),
        scales=jnp.asarray(sc["log_scales"]),
        quats=jnp.asarray(sc["quats"]),
        features_dc=jnp.asarray(np.asarray(rgb_to_sh_dc(jnp.asarray(sc["rgb"])))),
        features_rest=jnp.asarray(sc["f_rest"]),
        opacities=jnp.asarray(sc["opac_logit"]),
    )
    state = GaussianState(params, jnp.ones(n, bool))
    cfg = SplatModelConfig(
        sh_degree=SH_DEGREE,
        background_color="white",
        render=RenderConfig(impl="auto", isect_capacity=1 << 20),
    )
    step = jnp.int32(30 * cfg.sh_degree_interval)

    results = {}
    rng = np.random.default_rng(sc["target_seed"])
    for vi in range(len(sc["views"])):
        cam = make_camera(
            jnp.asarray(sc["c2w"][vi]), float(sc["fx"][vi]), float(sc["fy"][vi]),
            float(sc["cx"][vi]), float(sc["cy"][vi]), W, H,
        )
        target = jnp.asarray(rng.uniform(0, 1, (H, W, 3)).astype(np.float32))

        def loss_fn(p):
            out = render_model(
                GaussianState(p, state.alive), cam, step, cfg,
                training=False, background_override=jnp.ones(3),
            )
            return jnp.mean(jnp.abs(out.rgb - target)), out

        (loss, out), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(params)
        results[f"v{vi}_rgb"] = np.asarray(out.rgb)
        results[f"v{vi}_alpha"] = np.asarray(out.alpha).reshape(H, W)
        results[f"v{vi}_depth"] = np.asarray(out.depth)[..., 0]
        results[f"v{vi}_loss"] = np.float32(loss)
        results[f"v{vi}_d_means"] = np.asarray(grads.means)
        results[f"v{vi}_d_opac"] = np.asarray(grads.opacities)
        results[f"v{vi}_d_dc"] = np.asarray(grads.features_dc)
        results[f"v{vi}_d_scales"] = np.asarray(grads.scales)
        results[f"v{vi}_d_quats"] = np.asarray(grads.quats)
    results["stack"] = np.bytes_(b"gaussctrl_exp_tpu")
    return results


# ---------------------------------------------------------------- gsplat leg
def gsplat_available() -> bool:
    try:
        import gsplat  # noqa: F401
        import torch

        return torch.cuda.is_available()
    except Exception:
        return False


def run_gsplat(sc: dict) -> dict:
    """The reference call shape, gc_model.py:174-236 (gsplat v0.1.x API).

    Only runs on a CUDA machine with gsplat installed; kept importable-free
    at module load so this script works in the TPU build environment."""
    import torch
    from gsplat.project_gaussians import project_gaussians
    from gsplat.rasterize import rasterize_gaussians
    from gsplat.sh import spherical_harmonics

    dev = torch.device("cuda")
    H, W = sc["height"], sc["width"]
    BLOCK = 16
    n = sc["xyz"].shape[0]

    means = torch.tensor(sc["xyz"], device=dev, requires_grad=True)
    log_scales = torch.tensor(sc["log_scales"], device=dev, requires_grad=True)
    quats = torch.tensor(sc["quats"], device=dev, requires_grad=True)
    opac_logit = torch.tensor(sc["opac_logit"], device=dev, requires_grad=True)
    rgb = torch.tensor(sc["rgb"], device=dev)
    C0 = 0.28209479177387814
    f_dc = ((rgb - 0.5) / C0).clone().requires_grad_(True)
    f_rest = torch.tensor(sc["f_rest"], device=dev, requires_grad=True)

    results = {}
    rng = np.random.default_rng(sc["target_seed"])
    for vi in range(len(sc["views"])):
        c2w = torch.tensor(sc["c2w"][vi], device=dev)
        # gsplat/reference view matrix: flip y/z, invert (gc_model.py:130-138)
        R = c2w[:3, :3] * torch.tensor([1.0, -1.0, -1.0], device=dev)[None, :]
        T = c2w[:3, 3]
        R_inv = R.t()
        viewmat = torch.eye(4, device=dev)
        viewmat[:3, :3] = R_inv
        viewmat[:3, 3] = -R_inv @ T
        fx, fy = float(sc["fx"][vi]), float(sc["fy"][vi])
        cx, cy = float(sc["cx"][vi]), float(sc["cy"][vi])
        tile_bounds = ((W + BLOCK - 1) // BLOCK, (H + BLOCK - 1) // BLOCK, 1)

        xys, depths, radii, conics, comp, num_tiles_hit, cov3d = project_gaussians(
            means, torch.exp(log_scales), 1.0, quats / quats.norm(dim=-1, keepdim=True),
            viewmat.squeeze()[:3, :], fx, fy, cx, cy, H, W, BLOCK, clip_thresh=0.01,
        )
        viewdirs = means.detach() - c2w[:3, 3]
        viewdirs = viewdirs / viewdirs.norm(dim=-1, keepdim=True)
        sh_coeffs = torch.cat([f_dc[:, None, :], f_rest], dim=1)
        colors = torch.clamp_min(spherical_harmonics(SH_DEGREE, viewdirs, sh_coeffs) + 0.5, 0.0)
        opacs = torch.sigmoid(opac_logit)

        background = torch.ones(3, device=dev)
        rgb_out = rasterize_gaussians(
            xys, depths, radii, conics, num_tiles_hit, colors, opacs,
            H, W, BLOCK, background=background, return_alpha=False,
        )
        depth_im, alpha = rasterize_gaussians(
            xys, depths, radii, conics, num_tiles_hit,
            depths[:, None].expand(-1, 3), opacs, H, W, BLOCK,
            background=torch.zeros(3, device=dev), return_alpha=True,
        )
        depth_im = depth_im[..., 0:1] / alpha[..., None].clamp_min(1e-10)
        depth_im = torch.where(alpha[..., None] > 0, depth_im, depth_im.max())

        target = torch.tensor(
            rng.uniform(0, 1, (H, W, 3)).astype(np.float32), device=dev
        )
        loss = (rgb_out - target).abs().mean()
        for p in (means, log_scales, quats, opac_logit, f_dc, f_rest):
            if p.grad is not None:
                p.grad = None
        loss.backward()
        results[f"v{vi}_rgb"] = rgb_out.detach().cpu().numpy()
        results[f"v{vi}_alpha"] = alpha.detach().cpu().numpy()
        results[f"v{vi}_depth"] = depth_im[..., 0].detach().cpu().numpy()
        results[f"v{vi}_loss"] = np.float32(loss.item())
        results[f"v{vi}_d_means"] = means.grad.cpu().numpy()
        results[f"v{vi}_d_opac"] = opac_logit.grad.cpu().numpy()
        results[f"v{vi}_d_dc"] = f_dc.grad.cpu().numpy()
        results[f"v{vi}_d_scales"] = log_scales.grad.cpu().numpy()
        results[f"v{vi}_d_quats"] = quats.grad.cpu().numpy()
    results["stack"] = np.bytes_(b"gsplat")
    return results


# ---------------------------------------------------------------- comparison
def compare(a: dict, b: dict, tol: dict) -> dict:
    """Per-output max-abs/max-rel deltas + verdicts. Depth compared only
    where both sides saw geometry (alpha > 0.5); the empty-pixel fill
    conventions differ (ours: 1000-fill; gsplat: normalized-by-alpha)."""
    report = {}
    ok_all = True
    keys = sorted(k for k in a if k.startswith("v") and not k.endswith("_loss"))
    for k in keys:
        x, y = np.asarray(a[k], np.float64), np.asarray(b[k], np.float64)
        if k.endswith("_depth"):
            va, vb = a[k.replace("_depth", "_alpha")], b[k.replace("_depth", "_alpha")]
            m = (np.asarray(va) > 0.5) & (np.asarray(vb) > 0.5)
            if not m.any():
                continue
            x, y = x[m], y[m]
            rel = np.abs(x - y) / np.maximum(np.abs(y), 1e-6)
            ok = float(rel.max()) < tol["depth_rel"]
            report[k] = {"max_rel": float(rel.max()), "ok": ok}
        elif "_d_" in k:
            denom = max(float(np.abs(y).max()), 1e-12)
            rel = float(np.abs(x - y).max()) / denom
            ok = rel < tol["grad_rel"]
            report[k] = {"max_rel_vs_maxgrad": rel, "ok": ok}
        else:
            ab = float(np.abs(x - y).max())
            key = "rgb_abs" if k.endswith("_rgb") else "alpha_abs"
            ok = ab < tol[key]
            report[k] = {"max_abs": ab, "ok": ok}
        ok_all = ok_all and ok
    report["ALL_OK"] = ok_all
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="bear", choices=["bear", "garden", "face",
                                                        "fangzhou", "stone_horse", "dinosaur"])
    ap.add_argument("--mode", default="report", choices=["report", "capture", "check"])
    ap.add_argument("--views", type=int, default=2)
    ap.add_argument("--out", default="goldens")
    ap.add_argument("--golden", default=None)
    ap.add_argument("--grad-rel", type=float, default=DEFAULT_TOL["grad_rel"])
    args = ap.parse_args()
    tol = dict(DEFAULT_TOL, grad_rel=args.grad_rel)

    sc = build_scene(args.scene, args.views)
    print(f"# scene={args.scene} views={len(sc['views'])} "
          f"gaussians={sc['xyz'].shape[0]} {sc['width']}x{sc['height']}",
          file=sys.stderr)

    if args.mode == "capture":
        res = run_gsplat(sc) if gsplat_available() else run_ours(sc)
        out = Path(args.out)
        out.mkdir(parents=True, exist_ok=True)
        path = out / f"{args.scene}.npz"
        np.savez_compressed(path, **res)
        print(json.dumps({"captured": str(path),
                          "stack": bytes(res["stack"]).decode()}))
        return

    ours = run_ours(sc)
    if args.mode == "check":
        golden = dict(np.load(args.golden, allow_pickle=False))
        rep = compare(ours, golden, tol)
        print(json.dumps({"mode": "check", "golden": args.golden, **rep}, indent=1))
        sys.exit(0 if rep["ALL_OK"] else 1)

    # report mode
    if not gsplat_available():
        print(json.dumps({
            "mode": "report", "gsplat": "unavailable (no CUDA gsplat in this env)",
            "ours_finite": all(np.isfinite(v).all() for k, v in ours.items()
                               if k != "stack"),
            "next": "run with --mode capture on a GPU machine, then --mode "
                    "check --golden <file> here",
        }))
        return
    theirs = run_gsplat(sc)
    rep = compare(ours, theirs, tol)
    print(json.dumps({"mode": "report", **rep}, indent=1))
    sys.exit(0 if rep["ALL_OK"] else 1)


if __name__ == "__main__":
    main()
