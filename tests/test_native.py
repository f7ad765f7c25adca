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


# ---------------------------------------------------------------------------
# imageio: JPEG decode + undistort (native/imageio.cpp)
# ---------------------------------------------------------------------------

import ctypes

import numpy as np
import pytest

BEAR_JPG = "/root/reference/data/bear/images/frame_00001.jpg"


@pytest.fixture(scope="module")
def imgio():
    from gaussctrl_exp_tpu.native import get_imageio

    lib = get_imageio()
    if lib is None:
        pytest.skip("native imageio unavailable (no g++?)")
    return lib


def test_idct_matches_bruteforce(imgio, rng):
    aan = np.array([1.0, 1.387039845322148, 1.306562964876377, 1.175875602419359,
                    1.0, 0.785694958387102, 0.541196100146197, 0.275899379282943])
    F = rng.normal(size=(8, 8)).astype(np.float64) * 50
    x = np.arange(8)
    u = np.arange(8)
    C = np.where(u == 0, 1 / np.sqrt(2), 1.0)
    cosm = np.cos((2 * x[:, None] + 1) * u[None, :] * np.pi / 16)
    ref = 0.25 * cosm @ (C[:, None] * C[None, :] * F) @ cosm.T
    inp = (F * aan[:, None] * aan[None, :] * 0.125).astype(np.float32).ravel()
    out = np.zeros(64, np.float32)
    imgio.idct_test(inp.ctypes.data_as(ctypes.c_void_p), out.ctypes.data_as(ctypes.c_void_p))
    np.testing.assert_allclose(out.reshape(8, 8), ref, atol=1e-3)


def test_jpeg_decode_matches_pil(imgio):
    from pathlib import Path

    if not Path(BEAR_JPG).exists():
        pytest.skip("reference data not mounted")
    from PIL import Image

    h = imgio.img_open(BEAR_JPG.encode())
    assert h, "baseline JPEG decode failed"
    W, H = imgio.img_width(h), imgio.img_height(h)
    buf = np.zeros((H, W, 3), np.uint8)
    imgio.img_copy(h, buf.ctypes.data_as(ctypes.c_void_p))
    imgio.img_close(h)
    pil = np.asarray(Image.open(BEAR_JPG).convert("RGB"))
    assert buf.shape == pil.shape
    d = np.abs(buf.astype(np.int16) - pil.astype(np.int16))
    assert d.mean() < 1.0 and np.percentile(d, 99) <= 4 and d.max() <= 24, (
        d.mean(), d.max())


def test_undistort_matches_cv2(imgio, rng):
    cv2 = pytest.importorskip("cv2")
    H = W = 128
    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    img = cv2.GaussianBlur(img, (7, 7), 2.0)
    K = np.array([[140.0, 0, 64.0], [0, 141.0, 63.0], [0, 0, 1]])
    dist6 = np.array([0.0146, -0.0283, 0.001, 0.0005, 0.00015, 0.0006])
    d_cv = np.array([dist6[0], dist6[1], dist6[4], dist6[5], dist6[2], dist6[3], 0, 0])
    newK, _ = cv2.getOptimalNewCameraMatrix(K, d_cv, (W, H), 0)
    ref = cv2.undistort(img, K, d_cv, None, newK)
    out = np.zeros_like(img)
    imgio.undistort_f32(
        img.ctypes.data_as(ctypes.c_void_p), H, W, 3,
        np.ascontiguousarray(K, np.float64).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(dist6, np.float64).ctypes.data_as(ctypes.c_void_p),
        np.ascontiguousarray(newK, np.float64).ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    # differences = cv2's 5-bit fixed-point bilinear vs float bilinear
    assert np.abs(out - ref).max() < 0.01


def test_optimal_new_K_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    from gaussctrl_exp_tpu.data.undistort import optimal_new_K, undistort_points

    K = np.array([[540.0, 0, 256.0], [0, 542.0, 258.0], [0, 0, 1]])
    for dist6 in [
        np.array([0.0146, -0.0283, 0.0, 0.0, 0.00015, 0.0006]),
        np.array([0.012, -0.0225, 0.001, 0.0005, -0.004, 0.00017]),
        np.array([-0.05, 0.01, 0.0, 0.0, 0.002, -0.001]),
    ]:
        d_cv = np.array([dist6[0], dist6[1], dist6[4], dist6[5], dist6[2], dist6[3], 0, 0])
        ref, roi_ref = cv2.getOptimalNewCameraMatrix(K, d_cv, (512, 512), 0)
        got, roi = optimal_new_K(K, dist6, 512, 512)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=0.05)
        assert all(abs(a - b) <= 1 for a, b in zip(roi, roi_ref)), (roi, roi_ref)
        pts = np.array([[10.0, 20.0], [500.0, 30.0], [256.0, 256.0], [5.0, 505.0]])
        r = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, d_cv).reshape(-1, 2)
        np.testing.assert_allclose(undistort_points(pts, K, dist6), r, atol=1e-9)


def test_batch_loader_matches_fallback_datamanager():
    from pathlib import Path

    if not Path("/root/reference/data/face").exists():
        pytest.skip("reference data not mounted")
    import gaussctrl_exp_tpu.data.datamanager as dm
    from gaussctrl_exp_tpu.data import DataManagerConfig, DataParserConfig

    cfg = DataManagerConfig(dataparser=DataParserConfig(data="/root/reference/data/face"))
    m1 = dm.DataManager(cfg)
    orig = dm._cache_images_native
    dm._cache_images_native = lambda *a, **k: None
    try:
        m2 = dm.DataManager(cfg)
    finally:
        dm._cache_images_native = orig
    assert m1.images.shape == m2.images.shape
    d = np.abs(m1.images - m2.images)
    assert d.mean() < 0.01, d.mean()
    assert np.abs(np.array(m1.fx) - np.array(m2.fx)).max() < 0.05
    assert np.abs(np.array(m1.cx) - np.array(m2.cx)).max() < 0.05
