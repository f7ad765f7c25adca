"""End-to-end CLI integration on a synthetic on-disk scene: train via
cli.train.run, render via cli.render subcommands (CPU, tiny shapes)."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def mini_scene(tmp_path_factory):
    """A tiny nerfstudio-format scene: 3 views, 64x64, with a seed ply."""
    root = tmp_path_factory.mktemp("scene")
    (root / "images").mkdir()
    rng = np.random.default_rng(0)

    frames = []
    for i, ang in enumerate([0.0, 0.4, -0.4]):
        from gaussctrl_exp_tpu.cameras import look_at

        eye = np.array([4.0 * np.sin(ang), -4.0 * np.cos(ang), 1.0])
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :4] = look_at(eye, np.zeros(3))
        img = (rng.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
        name = f"images/frame_{i+1:05d}.jpg"
        Image.fromarray(img).save(root / name)
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})

    n = 50
    xyz = rng.normal(size=(n, 3)).astype(np.float32) * 0.5
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    with open(root / "sparse_pc.ply", "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\nend_header\n")
        rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                                 ("r", "u1"), ("g", "u1"), ("b", "u1")])
        rec["x"], rec["y"], rec["z"] = xyz.T
        rec["r"], rec["g"], rec["b"] = rgb.T
        f.write(rec.tobytes())

    meta = {
        "w": 64, "h": 64, "fl_x": 70.0, "fl_y": 70.0, "cx": 32.0, "cy": 32.0,
        "camera_model": "OPENCV", "ply_file_path": "sparse_pc.ply",
        "frames": frames,
    }
    (root / "transforms.json").write_text(json.dumps(meta))
    return root


@pytest.mark.slow
def test_train_cli_end_to_end(mini_scene, tmp_path):
    from gaussctrl_exp_tpu.cli.train import run
    from gaussctrl_exp_tpu.utils.cliconf import parse_config
    from gaussctrl_exp_tpu.configs import GaussCtrlConfig

    cfg, _ = parse_config(
        GaussCtrlConfig,
        [
            "--data", str(mini_scene),
            "--output-dir", str(tmp_path / "out"),
            "--experiment-name", "mini",
            "--max-num-iterations", "6",
            "--pipeline.render-rate", "6",
            "--steps-per-eval-image", "3",
            "--capacity", "64",
            "--train.model.render.impl", "jnp",
            "--train.model.render.isect-capacity", "4096",
            "--train.model.render.max-per-tile", "128",
        ],
    )
    trainer = run(cfg)
    assert trainer.step == 6
    out = tmp_path / "out" / "mini"
    evals = list((out / "logs").glob("eval_*.png"))  # EventWriter.put_image
    assert len(evals) >= 2
    assert (out / "ckpts").exists()
    assert (out / "history.json").exists()
    # observability surface: JSONL scalars incl. eval metrics + config dump
    events = (out / "logs" / "events.jsonl").read_text().strip().splitlines()
    assert any("eval_psnr" in e for e in events)
    assert any("main_loss" in e for e in events)
    # per-parameter-group gradient norms (reference Gradients/ family,
    # gc_trainer.py:283-292)
    assert any("Gradients/means" in e for e in events)
    assert any("Gradients/Total" in e for e in events)
    assert (out / "logs" / "config.json").exists()


def _mini_ckpt(tmp_path, n=32, name="step-000000010.ckpt"):
    from gaussctrl_exp_tpu.engine.checkpoint import export_splatfacto_checkpoint
    from gaussctrl_exp_tpu.models.gaussians import init_random

    gs = init_random(n, capacity=n, sh_degree=1, seed=0)
    ckpt = tmp_path / name
    export_splatfacto_checkpoint(gs, ckpt, step=10)
    return ckpt


def test_render_cli_dataset(mini_scene, tmp_path):
    from gaussctrl_exp_tpu.cli import render as render_cli

    ckpt = _mini_ckpt(tmp_path)
    out = tmp_path / "renders"
    render_cli.main(["dataset", "--data", str(mini_scene), "--ckpt", str(ckpt),
                     "--out", str(out)])
    assert len(list(out.glob("frame_*.png"))) == 3
    # depth sidecars written next to the scene (gc_render.py behavior)
    depth_files = list((mini_scene / "depth_npy").glob("*.npy"))
    assert len(depth_files) == 3
    d = np.load(depth_files[0])
    assert d.shape == (64, 64) and np.isfinite(d).all()


def test_render_cli_spiral(mini_scene, tmp_path):
    from gaussctrl_exp_tpu.cli import render as render_cli

    ckpt = _mini_ckpt(tmp_path, n=16, name="s.ckpt")
    out = tmp_path / "spiral"
    render_cli.main(["spiral", "--data", str(mini_scene), "--ckpt", str(ckpt),
                     "--out", str(out), "--fmt", "jpg", "--fps", "4", "--frames", "4",
                     "--outputs", "rgb", "depth", "accumulation"])
    frames = list(out.glob("frame_*.jpg"))
    assert len(frames) == 4
    # three outputs concatenated horizontally (rendered_output_names parity)
    w, h = Image.open(frames[0]).size
    assert (w, h) == (64 * 3, 64)
    # mp4 when an encoder exists, GIF fallback otherwise
    assert (out / "render.mp4").exists() or (out / "render.gif").exists()


def _camera_path_json(root, n=3, camera_type="perspective", hw=64):
    import math

    frames = []
    for ang in np.linspace(0, 0.8, n):
        from gaussctrl_exp_tpu.cameras import look_at

        eye = np.array([4.0 * math.sin(ang), -4.0 * math.cos(ang), 1.0])
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :4] = look_at(eye, np.zeros(3))
        frames.append({"camera_to_world": c2w.reshape(-1).tolist(), "fov": 50.0})
    meta = {"render_height": hw, "render_width": hw, "camera_type": camera_type,
            "camera_path": frames, "seconds": 1.0}
    p = root / f"path_{camera_type}.json"
    p.write_text(json.dumps(meta))
    return p


def test_render_cli_camera_path_stereo(mini_scene, tmp_path):
    """ODS camera path → per-eye renders stacked vertically (gc_render.py:566)."""
    from gaussctrl_exp_tpu.cli import render as render_cli

    ckpt = _mini_ckpt(tmp_path, n=16, name="ods.ckpt")
    path_json = _camera_path_json(tmp_path, n=2, camera_type="omni-directional-stereo")
    out = tmp_path / "ods"
    render_cli.main(["camera-path", "--camera-path", str(path_json),
                     "--ckpt", str(ckpt), "--out", str(out), "--fps", "2"])
    frames = list(out.glob("frame_*.png"))
    assert len(frames) == 2
    w, h = Image.open(frames[0]).size
    assert (w, h) == (64, 128)  # top-bottom stack


def test_render_cli_nearest_camera(mini_scene, tmp_path):
    """--render-nearest-camera appends the closest unoccluded train view."""
    from gaussctrl_exp_tpu.cli import render as render_cli

    ckpt = _mini_ckpt(tmp_path, n=16, name="near.ckpt")
    path_json = _camera_path_json(tmp_path, n=2)
    out = tmp_path / "near"
    render_cli.main(["camera-path", "--camera-path", str(path_json),
                     "--ckpt", str(ckpt), "--out", str(out), "--fps", "2",
                     "--data", str(mini_scene),
                     "--render-nearest-camera", "--check-occlusions"])
    frames = list(out.glob("frame_*.png"))
    assert len(frames) == 2
    w, h = Image.open(frames[0]).size
    assert h == 64 and w == 128  # render + appended train view


def test_spherical_metadata_roundtrip(tmp_path):
    """MP4 atom surgery: inject the spherical uuid into moov/trak and read it
    back (gc_render.py:314-381 parity, synthetic minimal mp4)."""
    import struct

    from gaussctrl_exp_tpu.utils.video import (
        insert_spherical_metadata,
        read_spherical_metadata,
    )

    def box(tag, payload):
        return struct.pack(">I4s", 8 + len(payload), tag) + payload

    trak = box(b"trak", box(b"tkhd", b"\x00" * 84))
    moov = box(b"moov", box(b"mvhd", b"\x00" * 100) + trak)
    mp4 = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + box(b"mdat", b"\x00" * 64) + moov
    p = tmp_path / "t.mp4"
    p.write_bytes(mp4)

    assert read_spherical_metadata(p) is None
    insert_spherical_metadata(p, stereo_mode="top-bottom")
    xml = read_spherical_metadata(p)
    assert xml is not None
    assert b"equirectangular" in xml and b"top-bottom" in xml
    # box sizes stayed consistent: file still parses and ftyp/mdat untouched
    data = p.read_bytes()
    assert data[4:8] == b"ftyp"
    size, tag = struct.unpack(">I4s", data[len(mp4) - len(moov):][:8])
    assert tag == b"moov" and size == len(data) - (len(mp4) - len(moov))