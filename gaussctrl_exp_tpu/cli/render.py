"""``gctpu-render`` — render datasets / camera paths (≈ ``ns-gaussctrl-render``).

Subcommands mirror the reference CLI (/root/reference/gaussctrl/gc_render.py:875-888):
  dataset      render all views of a scene split; saves rgb images and raw
               depth ``.npy`` sidecars into ``depth_npy/`` (the inputs the
               edit pipeline consumes, gc_render.py:826-838)
  camera-path  render a nerfstudio camera-path json to frames / mp4; supports
               omnidirectional-stereo / VR180 per-eye rendering with stereo
               stacking + spherical MP4 metadata (gc_render.py:314-381,481-599)
               and the nearest-train-camera occlusion probe (gc_render.py:151-190)
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

STEREO_TYPES = {
    "omni-directional-stereo": "ods",
    "omnidirectional": "ods",
    "ods": "ods",
    "vr180": "vr180",
}


def _load_state(args, capacity=1 << 17):
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


def _frame_from_outputs(out, outputs, near=None, far=None):
    """Concatenate requested output images horizontally (the reference's
    rendered_output_names loop, gc_render.py:222-244)."""
    from ..utils.colormaps import apply_depth_colormap

    cols = []
    alpha = np.asarray(out.alpha)
    for name in outputs:
        if name == "rgb":
            cols.append(np.clip(np.asarray(out.rgb), 0, 1))
        elif name == "depth":
            cols.append(apply_depth_colormap(np.asarray(out.depth), alpha, near, far))
        elif name == "accumulation":
            cols.append(np.repeat(np.clip(alpha, 0, 1), 3, axis=-1))
        else:
            raise ValueError(f"unknown output {name!r}")
    return (np.concatenate(cols, axis=1) * 255).astype(np.uint8)


def _make_render_jit(cfg=None):
    import jax

    from ..models.gaussians import GaussianState
    from ..models.splat_model import SplatModelConfig, render_model
    from ..ops.renderer import RenderConfig

    cfg = cfg or SplatModelConfig(background_color="white", render=RenderConfig(impl="auto"))
    return jax.jit(lambda p, a, cam: render_model(GaussianState(p, a), cam, 30_000, cfg))


def _render_cameras(gs, cameras, out_dir: Path, fmt: str, save_depth_npy: bool,
                    depth_dir: Path | None = None, video: bool = False, fps: int = 24,
                    dataparser_scale: float = 1.0, outputs=("rgb",),
                    nearest=None, stereo: str | None = None, ipd: float = 0.064):
    from PIL import Image

    out_dir.mkdir(parents=True, exist_ok=True)
    if save_depth_npy and depth_dir is not None:
        depth_dir.mkdir(parents=True, exist_ok=True)
    render_jit = _make_render_jit()
    frames = []
    for i, cam in enumerate(cameras):
        if stereo:
            from ..utils.video import stack_stereo

            eyes = []
            for side in (-1.0, +1.0):
                ecam = _offset_eye(cam, side * ipd / 2.0)
                out = render_jit(gs.params, gs.alive, ecam)
                eyes.append(_frame_from_outputs(out, outputs))
            frame = stack_stereo(eyes[0], eyes[1], stereo)
        else:
            out = render_jit(gs.params, gs.alive, cam)
            frame = _frame_from_outputs(out, outputs)
            if save_depth_npy and depth_dir is not None:
                # raw depth divided by the dataparser scale (gc_render.py:826-838)
                np.save(depth_dir / f"frame_{i+1:05d}.npy",
                        np.asarray(out.depth)[..., 0] / dataparser_scale)
        if nearest is not None:
            frame = np.concatenate([frame, nearest.lookup(gs, render_jit, cam, frame.shape[0])], axis=1)
        Image.fromarray(frame).save(out_dir / f"frame_{i+1:05d}.{fmt}")
        frames.append(frame)
        print(f"rendered {i+1}/{len(cameras)}", end="\r")
    print()
    if video:
        vp = _write_video(out_dir, frames, fps)
        if vp is not None and vp.suffix == ".mp4" and stereo:
            from ..utils.video import insert_spherical_metadata

            insert_spherical_metadata(
                vp, {"ods": "top-bottom", "vr180": "left-right"}[stereo]
            )
    return frames


def _offset_eye(cam, offset: float):
    """Shift the camera along its right axis for stereo eye separation."""
    from ..cameras import make_camera

    c2w = np.array(cam.c2w, np.float32)
    c2w[:3, 3] += offset * c2w[:3, 0]
    return make_camera(c2w, cam.fx, cam.fy, cam.cx, cam.cy, cam.width, cam.height)


class NearestCameraProbe:
    """Pick the nearest unoccluded training view per rendered camera and
    return its image column (gc_render.py:151-190: dist = 0.3·quat-dist +
    0.7·position-dist; occlusion = scene depth along the line of sight closer
    than the train camera)."""

    def __init__(self, parsed, check_occlusions: bool):
        from ..cameras import make_camera

        self.images = list(parsed.image_filenames)
        self.c2ws = np.asarray(parsed.cameras.c2w)
        self.check = check_occlusions
        self.make_camera = make_camera

    def lookup(self, gs, render_jit, cam, height: int) -> np.ndarray:
        from PIL import Image

        from ..cameras import look_at

        pos = np.array(cam.c2w[:3, 3])
        R = np.array(cam.c2w[:3, :3])
        qcam = _rotmat_to_quat(R)
        best, best_i, tbest, tbest_i = np.inf, -1, np.inf, -1
        for i in range(len(self.c2ws)):
            tpos = self.c2ws[i, :3, 3]
            q = _rotmat_to_quat(self.c2ws[i, :3, :3])
            dist = 0.3 * (1 - np.dot(q, qcam) ** 2) + 0.7 * float(np.linalg.norm(tpos - pos))
            if dist < tbest:
                tbest, tbest_i = dist, i
            if dist >= best:
                continue
            if self.check:
                # probe: tiny depth render from the path camera toward the
                # train camera; occluded if the scene surface is closer
                d = float(np.linalg.norm(tpos - pos))
                if d > 1e-6:
                    probe_cam = self.make_camera(
                        look_at(pos, tpos), 16.0, 16.0, 8.0, 8.0, 16, 16
                    )
                    out = render_jit(gs.params, gs.alive, probe_cam)
                    center = float(np.asarray(out.depth)[8, 8, 0])
                    if center < d:
                        continue
            best, best_i = dist, i
        idx = best_i if best_i >= 0 else tbest_i
        img = np.asarray(Image.open(self.images[idx]).convert("RGB"))
        w = int(round(img.shape[1] * height / img.shape[0]))
        img = np.asarray(Image.fromarray(img).resize((w, height)))
        return img


def _rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """(3,3) rotation → wxyz unit quaternion (host-side, for camera distance)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                      (R[1, 0] - R[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[k, k], 1e-12)) * 2
        q = np.zeros(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    return q / np.linalg.norm(q)


def _write_video(out_dir: Path, frames, fps: int) -> Path | None:
    """mp4 via ffmpeg/imageio when available, else animated GIF (this image
    has no ffmpeg; the reference shells out to ffmpeg, gc_render.py:473)."""
    try:
        import imageio

        p = out_dir / "render.mp4"
        imageio.mimwrite(p, frames, fps=fps)
        return p
    except Exception:
        pass
    import shutil
    import subprocess

    if shutil.which("ffmpeg"):
        p = out_dir / "render.mp4"
        cmd = ["ffmpeg", "-y", "-framerate", str(fps), "-i",
               str(out_dir / "frame_%05d.png"), "-pix_fmt", "yuv420p", str(p)]
        if subprocess.run(cmd, capture_output=True).returncode == 0:
            return p
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    p = out_dir / "render.gif"
    imgs[0].save(p, save_all=True, append_images=imgs[1:],
                 duration=int(1000 / fps), loop=0)
    return p


def _scaled(v, s):
    return v if s == 1 else v / s


def _dataset_cameras(parsed, downscale: int = 1):
    from ..cameras import make_camera

    return [
        make_camera(parsed.cameras.c2w[i], _scaled(parsed.cameras.fx[i], downscale),
                    _scaled(parsed.cameras.fy[i], downscale),
                    _scaled(parsed.cameras.cx[i], downscale),
                    _scaled(parsed.cameras.cy[i], downscale),
                    parsed.cameras.width // downscale, parsed.cameras.height // downscale)
        for i in range(len(parsed.image_filenames))
    ]


def cmd_dataset(args):
    from ..data.dataparser import DataParserConfig, load_scene

    parsed = load_scene(DataParserConfig(data=Path(args.data)), split=args.split)
    cams = _dataset_cameras(parsed, args.downscale_factor)
    gs = _load_state(args)
    _render_cameras(gs, cams, Path(args.out), args.fmt, save_depth_npy=True,
                    depth_dir=Path(args.data) / "depth_npy",
                    dataparser_scale=parsed.dataparser_scale, outputs=args.outputs)


def _path_cameras(path_json: Path, downscale: int = 1):
    from ..cameras import make_camera

    meta = json.loads(path_json.read_text())
    H = int(meta["render_height"]) // downscale
    W = int(meta["render_width"]) // downscale
    cams = []
    for fr in meta["camera_path"]:
        c2w = np.asarray(fr["camera_to_world"], np.float32).reshape(4, 4)[:3, :4]
        fov = float(fr.get("fov", 50.0)) * np.pi / 180.0
        fy = H / (2 * np.tan(fov / 2))
        cams.append(make_camera(c2w, fy, fy, W / 2, H / 2, W, H))
    ctype = str(meta.get("camera_type", "perspective")).lower().replace("_", "-")
    return cams, STEREO_TYPES.get(ctype)


def cmd_camera_path(args):
    cams, stereo = _path_cameras(Path(args.camera_path), args.downscale_factor)
    gs = _load_state(args)
    nearest = None
    if args.render_nearest_camera:
        if not args.data:
            raise SystemExit("--render-nearest-camera requires --data")
        from ..data.dataparser import DataParserConfig, load_scene

        parsed = load_scene(DataParserConfig(data=Path(args.data)))
        nearest = NearestCameraProbe(parsed, args.check_occlusions)
    _render_cameras(gs, cams, Path(args.out), args.fmt, save_depth_npy=False,
                    video=True, fps=args.fps, outputs=args.outputs,
                    nearest=nearest, stereo=stereo, ipd=args.ipd)


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
    from ..cameras import make_camera
    from ..data.dataparser import DataParserConfig, load_scene

    parsed = load_scene(DataParserConfig(data=Path(args.data)))
    poses = _interp_poses(list(np.asarray(parsed.cameras.c2w)), args.steps)
    d = args.downscale_factor
    cams = [
        make_camera(p, _scaled(parsed.cameras.fx[0], d), _scaled(parsed.cameras.fy[0], d),
                    _scaled(parsed.cameras.cx[0], d), _scaled(parsed.cameras.cy[0], d),
                    parsed.cameras.width // d, parsed.cameras.height // d)
        for p in poses
    ]
    gs = _load_state(args)
    _render_cameras(gs, cams, Path(args.out), args.fmt, False, video=True, fps=args.fps,
                    outputs=args.outputs)


def cmd_spiral(args):
    from ..cameras import look_at, make_camera
    from ..data.dataparser import DataParserConfig, load_scene

    parsed = load_scene(DataParserConfig(data=Path(args.data)))
    radius = float(np.linalg.norm(parsed.cameras.c2w[:, :3, 3], axis=1).mean())
    height = float(parsed.cameras.c2w[:, 2, 3].mean())
    d = args.downscale_factor
    cams = []
    for ang in np.linspace(0, 2 * np.pi, args.frames, endpoint=False):
        eye = np.array([radius * np.cos(ang), radius * np.sin(ang), height])
        cams.append(
            make_camera(look_at(eye, np.zeros(3)), _scaled(parsed.cameras.fx[0], d),
                        _scaled(parsed.cameras.fy[0], d), _scaled(parsed.cameras.cx[0], d),
                        _scaled(parsed.cameras.cy[0], d),
                        parsed.cameras.width // d, parsed.cameras.height // d)
        )
    gs = _load_state(args)
    _render_cameras(gs, cams, Path(args.out), args.fmt, False, video=True, fps=args.fps,
                    outputs=args.outputs)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in [("dataset", cmd_dataset), ("camera-path", cmd_camera_path),
                     ("interpolate", cmd_interpolate), ("spiral", cmd_spiral)]:
        sp = sub.add_parser(name)
        sp.add_argument("--ckpt", required=True, help="orbax ckpt dir or splatfacto .ckpt")
        sp.add_argument("--out", required=True)
        sp.add_argument("--fmt", default="png", choices=["png", "jpg"])
        sp.add_argument("--fps", type=int, default=24)
        sp.add_argument("--outputs", nargs="+", default=["rgb"],
                        choices=["rgb", "depth", "accumulation"],
                        help="output images concatenated horizontally "
                             "(rendered_output_names, gc_render.py:222-244)")
        sp.add_argument("--downscale-factor", type=int, default=1, dest="downscale_factor")
        if name != "camera-path":
            sp.add_argument("--data", required=True)
        if name == "dataset":
            sp.add_argument("--split", default="train")
        if name == "camera-path":
            sp.add_argument("--camera-path", required=True, dest="camera_path")
            sp.add_argument("--data", default=None)
            sp.add_argument("--ipd", type=float, default=0.064,
                            help="stereo eye separation in world units")
            sp.add_argument("--render-nearest-camera", action="store_true",
                            dest="render_nearest_camera")
            sp.add_argument("--check-occlusions", action="store_true",
                            dest="check_occlusions")
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
