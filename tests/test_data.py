"""Data layer: PLY reader, dataparser on the bundled bear scene, datamanager."""

import json
from pathlib import Path

import numpy as np
import pytest

from gaussctrl_exp_tpu.data.dataparser import (
    DataParserConfig,
    auto_orient_and_center_poses,
    load_scene,
    rotation_matrix_between,
)
from gaussctrl_exp_tpu.data.datamanager import DataManager, DataManagerConfig
from gaussctrl_exp_tpu.data.ply import read_ply_points

BEAR = Path("/root/reference/data/bear")


def test_read_ply_ascii_bear():
    xyz, rgb = read_ply_points(BEAR / "sparse_pc.ply")
    assert xyz.shape == (34174, 3) and xyz.dtype == np.float32
    assert rgb.shape == (34174, 3) and rgb.dtype == np.uint8
    np.testing.assert_allclose(xyz[0], [2.563399, 0.693437, -1.083436], rtol=1e-5)
    assert tuple(rgb[0]) == (172, 172, 172)


def test_read_ply_binary_roundtrip(tmp_path):
    n = 17
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    rec["x"], rec["y"], rec["z"] = xyz.T
    rec["red"], rec["green"], rec["blue"] = rgb.T
    p = tmp_path / "t.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"end_header\n")
        f.write(rec.tobytes())
    x2, c2 = read_ply_points(p)
    np.testing.assert_allclose(x2, xyz)
    np.testing.assert_array_equal(c2, rgb)


def test_rotation_matrix_between():
    a = np.array([0.3, -0.2, 0.9])
    b = np.array([0.0, 0.0, 1.0])
    R = rotation_matrix_between(a, b)
    np.testing.assert_allclose(R @ (a / np.linalg.norm(a)), b, atol=1e-6)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_auto_orient_up():
    """After orientation, the average camera up points to +z; origins centered."""
    rng = np.random.default_rng(1)
    poses = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
    # random rotation + offset
    theta = 0.7
    R = np.array([[1, 0, 0], [0, np.cos(theta), -np.sin(theta)], [0, np.sin(theta), np.cos(theta)]], np.float32)
    for i in range(5):
        poses[i, :3, :3] = R
        poses[i, :3, 3] = rng.normal(size=3) + 5.0
    oriented, tf = auto_orient_and_center_poses(poses)
    up = oriented[:, :3, 1].sum(0)
    np.testing.assert_allclose(up / np.linalg.norm(up), [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0, atol=1e-5)


def test_load_bear_scene():
    out = load_scene(DataParserConfig(data=BEAR))
    assert len(out.image_filenames) == 96
    assert all(p.exists() for p in out.image_filenames[:3])
    # filenames sorted
    names = [p.name for p in out.image_filenames]
    assert names == sorted(names)
    assert out.cameras.width == 512 and out.cameras.height == 512
    np.testing.assert_allclose(out.cameras.fx[0], 539.0520417301545, rtol=1e-6)
    # auto-scale: max |origin| == 1
    np.testing.assert_allclose(np.abs(out.cameras.c2w[:, :3, 3]).max(), 1.0, rtol=1e-5)
    # seed points transformed into the same frame (within a loose box)
    assert out.points_xyz.shape == (34174, 3)
    # sparse clouds have outliers; the bulk should live near the unit box
    assert np.median(np.abs(out.points_xyz)) < 2.0
    assert out.depth_filenames is None  # no sidecars in the bundled scene


def test_datamanager_subsetting_and_sampling():
    dm = DataManager(DataManagerConfig(dataparser=DataParserConfig(data=BEAR)))
    # 96 > 40 → subset to 4×10
    assert len(dm) == 40
    assert dm.images.shape[0] == 40 and dm.images.shape[3] == 3
    assert dm.images.dtype == np.float32 and 0.0 <= dm.images.min() and dm.images.max() <= 1.0
    # subsets are drawn one per quarter, sorted within each
    idx = dm.view_indices
    assert len(set(idx)) == 40
    for q in range(4):
        chunk = idx[q * 10 : (q + 1) * 10]
        assert chunk == sorted(chunk)
        assert all(q * 24 <= i < (q + 1) * 24 for i in chunk)
    # sampling cycles through all views before repeating
    seen = set()
    for _ in range(40):
        i, img = dm.next_train()
        assert img.shape == dm.images.shape[1:]
        seen.add(i)
    assert len(seen) == 40
    # write-back and reset
    dm.write_back(0, np.zeros_like(dm.images[0]))
    assert dm.images[0].max() == 0.0
    dm.reset_images()
    assert dm.images[0].max() > 0.0


def test_split_modes():
    """filename eval mode + explicit {split}_filenames override
    (gc_dataparser_ns.py:210-246)."""
    import numpy as np

    from gaussctrl_exp_tpu.data.dataparser import DataParserConfig, _split_indices

    names = ["images/train_00.jpg", "images/eval_01.jpg", "images/train_02.jpg",
             "images/test_03.jpg"]
    cfg = DataParserConfig(eval_mode="filename")
    np.testing.assert_array_equal(_split_indices(4, cfg, "train", names=names), [0, 2])
    np.testing.assert_array_equal(_split_indices(4, cfg, "val", names=names), [1, 3])

    # names without markers -> error
    import pytest

    with pytest.raises(RuntimeError, match="filename"):
        _split_indices(2, cfg, "train", names=["images/a.jpg", "images/b.jpg"])

    # explicit lists in transforms.json override eval_mode entirely
    meta = {"train_filenames": ["images/b.jpg"], "val_filenames": ["images/a.jpg"]}
    plain = ["images/a.jpg", "images/b.jpg"]
    cfg2 = DataParserConfig(eval_mode="all")
    np.testing.assert_array_equal(_split_indices(2, cfg2, "train", names=plain, meta=meta), [1])
    np.testing.assert_array_equal(_split_indices(2, cfg2, "val", names=plain, meta=meta), [0])
    with pytest.raises(RuntimeError, match="not found"):
        _split_indices(2, cfg2, "train", names=plain, meta={"train_filenames": ["images/zz.jpg"]})


def test_camera_from_datamanager():
    dm = DataManager(DataManagerConfig(dataparser=DataParserConfig(data=BEAR)))
    cam = dm.camera(0)
    assert cam.width == dm.width and cam.height == dm.height
    assert cam.c2w.shape == (3, 4)
