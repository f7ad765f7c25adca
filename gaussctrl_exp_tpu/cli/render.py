"""``gctpu-render`` — render datasets / camera paths (≈ ``ns-gaussctrl-render``).

Subcommands mirror the reference CLI (/root/reference/gaussctrl/gc_render.py:875-888):
  dataset      render all views of a scene split; saves rgb images and raw
               depth ``.npy`` sidecars into ``depth_npy/`` (the inputs the
               edit pipeline consumes, gc_render.py:826-838)
  camera-path  render a nerfstudio camera-path json to frames / mp4
  interpolate  render an interpolated trajectory through the training views
  spiral       render a spiral around the scene

Usage:
  gctpu-render dataset --data data/bear --ckpt outputs/.../ckpts --out renders/
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _load_state(args, capacity=1 << 17):
    import jax.numpy as jnp

    from ..engine.checkpoint import import_splatfacto_checkpoint, load_checkpoint
    from ..engine.trainer import TrainConfig, init_train_state
    from ..models.gaussians import GaussianState, init_random

    ckpt = Path(args.ckpt)
    if ckpt.suffix == ".ckpt":  # torch splatfacto checkpoint
        gs, _ = import_splatfacto_checkpoint(ckpt, capacity=capacity)
        return gs
    example = init_train_state(init_random(8, capacity=capacity), TrainConfig())
    state, _ = load_checkpoint(ckpt, example)
    return GaussianState(state.params, state.alive)


def _render_cameras(gs, cameras, out_dir: Path, fmt: str, save_depth_npy: bool,
                    depth_dir: Path | None = None, video: bool = False, fps: int = 24,
                    dataparser_scale: float = 1.0):
    from PIL import Image

    from ..models.gaussians import GaussianState
    from ..models.splat_model import SplatModelConfig, render_model
    from ..ops.renderer import RenderConfig
    from ..utils.colormaps import apply_depth_colormap

    cfg = SplatModelConfig(background_color="white", render=RenderConfig(impl="auto"))
    out_dir.mkdir(parents=True, exist_ok=True)
    if save_depth_npy and depth_dir is not None:
        depth_dir.mkdir(parents=True, exist_ok=True)
    frames = []
    import jax

    render_jit = jax.jit(
        lambda p, a, cam: render_model(GaussianState(p, a), cam, 30_000, cfg)
    )
    for i, cam in enumerate(cameras):
        out = render_jit(gs.params, gs.alive, cam)
        rgb = np.clip(np.asarray(out.rgb), 0, 1)
        img8 = (rgb * 255).astype(np.uint8)
        Image.fromarray(img8).save(out_dir / f"frame_{i+1:05d}.{fmt}")
        if save_depth_npy and depth_dir is not None:
            # raw depth divided by the dataparser scale (gc_render.py:826-838)
            np.save(depth_dir / f"frame_{i+1:05d}.npy",
                    np.asarray(out.depth)[..., 0] / dataparser_scale)
        frames.append(img8)
        print(f"rendered {i+1}/{len(cameras)}", end="\r")
    print()
    if video:
        _write_video(out_dir, frames, fps)
    return frames


def _write_video(out_dir: Path, frames, fps: int) -> None:
    """mp4 via ffmpeg/imageio when available, else animated GIF (this image
    has no ffmpeg; the reference shells out to ffmpeg, gc_render.py:473)."""
    try:
        import imageio

        imageio.mimwrite(out_dir / "render.mp4", frames, fps=fps)
        return
    except Exception:
        pass
    import shutil
    import subprocess

    if shutil.which("ffmpeg"):
        cmd = ["ffmpeg", "-y", "-framerate", str(fps), "-i",
               str(out_dir / "frame_%05d.png"), "-pix_fmt", "yuv420p",
               str(out_dir / "render.mp4")]
        if subprocess.run(cmd, capture_output=True).returncode == 0:
            return
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(out_dir / "render.gif", save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)


def cmd_dataset(args):
    from ..data.dataparser import DataParserConfig, load_scene
    from ..cameras import make_camera

    parsed = load_scene(DataParserConfig(data=Path(args.data)), split=args.split)
    cams = [
        make_camera(parsed.cameras.c2w[i], parsed.cameras.fx[i], parsed.cameras.fy[i],
                    parsed.cameras.cx[i], parsed.cameras.cy[i],
                    parsed.cameras.width, parsed.cameras.height)
        for i in range(len(parsed.image_filenames))
    ]
    gs = _load_state(args)
    out = Path(args.out)
    _render_cameras(gs, cams, out, args.fmt, save_depth_npy=True,
                    depth_dir=Path(args.data) / "depth_npy",
                    dataparser_scale=parsed.dataparser_scale)


def _path_cameras(path_json: Path):
    from ..cameras import make_camera

    meta = json.loads(path_json.read_text())
    H, W = int(meta["render_height"]), int(meta["render_width"])
    cams = []
    for fr in meta["camera_path"]:
        c2w = np.asarray(fr["camera_to_world"], np.float32).reshape(4, 4)[:3, :4]
        fov = float(fr.get("fov", 50.0)) * np.pi / 180.0
        fy = H / (2 * np.tan(fov / 2))
        cams.append(make_camera(c2w, fy, fy, W / 2, H / 2, W, H))
    return cams


def cmd_camera_path(args):
    cams = _path_cameras(Path(args.camera_path))
    gs = _load_state(args)
    _render_cameras(gs, cams, Path(args.out), args.fmt, save_depth_npy=False,
                    video=True, fps=args.fps)


def _interp_poses(c2ws, steps_per_transition=10):
    """Linear pose interpolation with renormalized rotations (gc_render interp)."""
    out = []
    for a, b in zip(c2ws[:-1], c2ws[1:]):
        for t in np.linspace(0, 1, steps_per_transition, endpoint=False):
            m = (1 - t) * a + t * b
            u, _, vt = np.linalg.svd(m[:3, :3])
            m = m.copy()
            m[:3, :3] = u @ vt
            out.append(m)
    return out


def cmd_interpolate(args):
    from ..data.dataparser import DataParserConfig, load_scene
    from ..cameras import make_camera

    parsed = load_scene(DataParserConfig(data=Path(args.data)))
    poses = _interp_poses(list(parsed.cameras.c2w), args.steps)
    cams = [
        make_camera(p, parsed.cameras.fx[0], parsed.cameras.fy[0], parsed.cameras.cx[0],
                    parsed.cameras.cy[0], parsed.cameras.width, parsed.cameras.height)
        for p in poses
    ]
    gs = _load_state(args)
    _render_cameras(gs, cams, Path(args.out), args.fmt, False, video=True, fps=args.fps)


def cmd_spiral(args):
    from ..cameras import look_at, make_camera
    from ..data.dataparser import DataParserConfig, load_scene

    parsed = load_scene(DataParserConfig(data=Path(args.data)))
    radius = float(np.linalg.norm(parsed.cameras.c2w[:, :3, 3], axis=1).mean())
    height = float(parsed.cameras.c2w[:, 2, 3].mean())
    cams = []
    for ang in np.linspace(0, 2 * np.pi, args.frames, endpoint=False):
        eye = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        cams.append(
            make_camera(look_at(eye, np.zeros(3)), parsed.cameras.fx[0], parsed.cameras.fy[0],
                        parsed.cameras.cx[0], parsed.cameras.cy[0],
                        parsed.cameras.width, parsed.cameras.height)
        )
    gs = _load_state(args)
    _render_cameras(gs, cams, Path(args.out), args.fmt, False, video=True, fps=args.fps)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    common = dict(fmt="png")
    for name, fn in [("dataset", cmd_dataset), ("camera-path", cmd_camera_path),
                     ("interpolate", cmd_interpolate), ("spiral", cmd_spiral)]:
        sp = sub.add_parser(name)
        sp.add_argument("--ckpt", required=True, help="orbax ckpt dir or splatfacto .ckpt")
        sp.add_argument("--out", required=True)
        sp.add_argument("--fmt", default="png", choices=["png", "jpg"])
        sp.add_argument("--fps", type=int, default=24)
        if name != "camera-path":
            sp.add_argument("--data", required=True)
        if name == "dataset":
            sp.add_argument("--split", default="train")
        if name == "camera-path":
            sp.add_argument("--camera-path", required=True, dest="camera_path")
        if name == "interpolate":
            sp.add_argument("--steps", type=int, default=10)
        if name == "spiral":
            sp.add_argument("--frames", type=int, default=120)
        sp.set_defaults(func=fn)
    args = p.parse_args(argv)
    args.func(args)


def entrypoint():
    main(sys.argv[1:])


if __name__ == "__main__":
    entrypoint()
