"""Native C++ PLY reader vs the numpy fallback (identical outputs)."""

import numpy as np
import pytest

from gaussctrl_exp_tpu.data.ply import _read_ply_native, read_ply_points_numpy

BEAR_PLY = "/root/reference/data/bear/sparse_pc.ply"


@pytest.fixture(scope="module")
def native_available():
    out = _read_ply_native(BEAR_PLY)
    if out is None:
        pytest.skip("native toolchain unavailable")
    return out


def test_native_matches_numpy_ascii(native_available):
    xyz_n, rgb_n = native_available
    xyz_p, rgb_p = read_ply_points_numpy(BEAR_PLY)
    np.testing.assert_allclose(xyz_n, xyz_p, rtol=1e-6)
    np.testing.assert_array_equal(rgb_n, rgb_p)


def test_native_matches_numpy_binary(tmp_path, native_available):
    n = 23
    rng = np.random.default_rng(1)
    xyz = rng.normal(size=(n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(n, 3)).astype(np.uint8)
    rec = np.zeros(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    rec["x"], rec["y"], rec["z"] = xyz.T
    rec["red"], rec["green"], rec["blue"] = rgb.T
    p = tmp_path / "b.ply"
    with open(p, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(b"end_header\n")
        f.write(rec.tobytes())
    out = _read_ply_native(p)
    assert out is not None
    np.testing.assert_allclose(out[0], xyz)
    np.testing.assert_array_equal(out[1], rgb)


def test_native_rejects_garbage(tmp_path, native_available):
    p = tmp_path / "bad.ply"
    p.write_bytes(b"not a ply file at all")
    assert _read_ply_native(p) is None
