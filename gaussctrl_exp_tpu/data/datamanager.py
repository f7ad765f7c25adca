"""Data manager: image caching + undistortion, view subsetting, train sampling.

Host-side equivalent of the reference's GaussCtrlDataManager
(/root/reference/gaussctrl/gc_datamanager.py):

  * caches + undistorts all images up front with cv2, updating intrinsics from
    ``cv2.getOptimalNewCameraMatrix`` (:112-186),
  * view subsetting: if views > subset_num × sampled_views_every_subset
    (4 × 10 = 40) and not load_all, splits views into ``subset_num`` contiguous
    anchors and random-samples ``sampled_views_every_subset`` per split,
    re-indexing (:89-110),
  * ``next_train`` pops a random unseen camera and re-populates when exhausted
    (:213-235),
  * edited-image write-back for the GaussCtrl edit loop (the pipeline replaces
    ``train_data[i]["image"]`` after editing, ad_pipeline.py:241-242).

Images live as a stacked (V, H, W, 3) float32 numpy array — one
host-to-device transfer per train step (or the whole stack resident on device
for small scenes), instead of per-image torch deepcopies.
"""

from __future__ import annotations

import dataclasses
import random
from pathlib import Path
from typing import Optional

import numpy as np

from .dataparser import DataParserConfig, DataparserOutputs, load_scene


@dataclasses.dataclass
class DataManagerConfig:
    dataparser: DataParserConfig = dataclasses.field(default_factory=DataParserConfig)
    subset_num: int = 4
    sampled_views_every_subset: int = 10
    load_all: bool = False
    seed: int = 0


def _load_image(path: Path) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), dtype=np.float32) / 255.0
    return img


def _fit_to(img: np.ndarray, H: int, W: int) -> np.ndarray:
    """Resize to the cameras' (downscaled) resolution: box filter for integer
    ratios (nerfstudio downscales with ffmpeg-area semantics), PIL otherwise."""
    h, w = img.shape[:2]
    if (h, w) == (H, W) or not (H and W):
        return img
    if h % H == 0 and w % W == 0 and h // H == w // W:
        r = h // H
        return img.reshape(H, r, W, r, -1).mean(axis=(1, 3))
    from PIL import Image

    return (
        np.asarray(
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).resize(
                (W, H), Image.LANCZOS
            ),
            dtype=np.float32,
        )
        / 255.0
    )


def _undistort(img: np.ndarray, K: np.ndarray, dist6: np.ndarray):
    """cv2 undistort with OPENCV (radial k1-k4 + tangential p1,p2) model.

    Returns (undistorted image, new K). Matches nerfstudio's `_undistort_image`
    use of getOptimalNewCameraMatrix(alpha=0) + undistort.
    """
    if not np.any(np.abs(dist6) > 0):
        return img, K
    import cv2

    # cv2 rational model: [k1, k2, p1, p2, k3, k4, 0, 0] (nerfstudio _undistort_image)
    d = np.array(
        [dist6[0], dist6[1], dist6[4], dist6[5], dist6[2], dist6[3], 0.0, 0.0], np.float32
    )
    h, w = img.shape[:2]
    newK, roi = cv2.getOptimalNewCameraMatrix(K, d, (w, h), 0)
    und = cv2.undistort(img, K, d, None, newK)
    x, y, rw, rh = roi
    und = und[y : y + rh, x : x + rw]
    newK[0, 2] -= x
    newK[1, 2] -= y
    return und, newK


def _cache_images_native(paths, cams) -> Optional[tuple]:
    """Decode + undistort every view with the C++ threaded batch loader
    (native/imageio.cpp): JPEG decode, per-view alpha=0 new camera matrix
    (numpy, data/undistort.py), bilinear remap — the native equivalent of the
    reference's cv2-based ``cache_images`` (gc_datamanager.py:112-186).

    Returns (images (V,H,W,3) f32, newKs (V,3,3), rois) or None when the
    native library is unavailable or the first image isn't a decodable JPEG.
    """
    import ctypes

    from ..native import get_imageio
    from .undistort import optimal_new_K

    lib = get_imageio()
    if lib is None:
        return None
    if cams.width and cams.height:  # target size (downscaled when ds > 1)
        W, H = int(cams.width), int(cams.height)
    else:
        h0 = lib.img_open(str(paths[0]).encode())
        if not h0:
            return None
        W, H = lib.img_width(h0), lib.img_height(h0)
        lib.img_close(h0)

    V = len(paths)
    Ks = np.zeros((V, 3, 3), np.float64)
    newKs = np.zeros((V, 3, 3), np.float64)
    dists = np.ascontiguousarray(cams.distortion[:V], np.float64)
    rois = []
    for i in range(V):
        Ks[i] = [[cams.fx[i], 0, cams.cx[i]], [0, cams.fy[i], cams.cy[i]], [0, 0, 1]]
        newKs[i], roi = optimal_new_K(Ks[i], dists[i], W, H)
        rois.append(roi)

    out = np.zeros((V, H, W, 3), np.float32)
    failed = np.full(V, -1, np.int32)
    cpaths = (ctypes.c_char_p * V)(*[str(p).encode() for p in paths])
    n_ok = lib.load_undistort_batch(
        cpaths, V, H, W,
        Ks.ctypes.data_as(ctypes.c_void_p),
        dists.ctypes.data_as(ctypes.c_void_p),
        newKs.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
        failed.ctypes.data_as(ctypes.c_void_p),
        0,
    )
    if n_ok < V:  # non-JPEG / progressive views: PIL decode + native remap
        for i in failed[failed >= 0]:
            img = np.ascontiguousarray(_fit_to(_load_image(paths[i]), H, W), np.float32)
            if img.shape[:2] != (H, W):
                return None
            if np.any(np.abs(dists[i]) > 0):
                src = np.ascontiguousarray(img)
                lib.undistort_f32(
                    src.ctypes.data_as(ctypes.c_void_p), H, W, 3,
                    Ks[i].ctypes.data_as(ctypes.c_void_p),
                    dists[i].ctypes.data_as(ctypes.c_void_p),
                    newKs[i].ctypes.data_as(ctypes.c_void_p),
                    out[i].ctypes.data_as(ctypes.c_void_p),
                )
            else:
                out[i] = img
    return out, newKs, rois


class DataManager:
    """Caches train images and serves (camera_index, image) train samples."""

    def __init__(self, config: DataManagerConfig, split: str = "train"):
        self.config = config
        self.parsed: DataparserOutputs = load_scene(config.dataparser, split)
        self._rng = random.Random(config.seed)

        cams = self.parsed.cameras
        n_views = len(self.parsed.image_filenames)

        native = _cache_images_native(self.parsed.image_filenames, cams)
        if native is not None:
            stack, newKs, rois = native
            images, fx, fy, cx, cy = [], [], [], [], []
            for i in range(stack.shape[0]):
                x, y, rw, rh = rois[i]
                images.append(stack[i, y : y + rh, x : x + rw])
                fx.append(newKs[i][0, 0])
                fy.append(newKs[i][1, 1])
                cx.append(newKs[i][0, 2] - x)
                cy.append(newKs[i][1, 2] - y)
        else:  # pure-Python fallback: PIL decode + cv2 undistort per view
            images = []
            fx, fy, cx, cy = [], [], [], []
            for i, path in enumerate(self.parsed.image_filenames):
                img = _fit_to(_load_image(path), cams.height, cams.width)
                K = np.array(
                    [[cams.fx[i], 0, cams.cx[i]], [0, cams.fy[i], cams.cy[i]], [0, 0, 1]],
                    np.float32,
                )
                img, K = _undistort(img, K, cams.distortion[i])
                images.append(img)
                fx.append(K[0, 0])
                fy.append(K[1, 1])
                cx.append(K[0, 2])
                cy.append(K[1, 2])
        # undistortion ROI can differ by a pixel between views; crop to common size
        H = min(im.shape[0] for im in images)
        W = min(im.shape[1] for im in images)
        images = [im[:H, :W] for im in images]

        self.images = np.stack(images)  # (V, H, W, 3)
        self.c2w = cams.c2w
        self.fx = np.asarray(fx, np.float32)
        self.fy = np.asarray(fy, np.float32)
        self.cx = np.asarray(cx, np.float32)
        self.cy = np.asarray(cy, np.float32)
        self.width, self.height = W, H

        # --- view subsetting (gc_datamanager.py:89-110)
        cap = config.subset_num * config.sampled_views_every_subset
        if n_views <= cap or config.load_all:
            self.view_indices = list(range(n_views))
        else:
            anchors = list(range(0, n_views, n_views // config.subset_num))[: config.subset_num]
            anchors = anchors + [n_views]
            sampled = []
            for a, b in zip(anchors[:-1], anchors[1:]):
                sampled += sorted(self._rng.sample(range(a, b), config.sampled_views_every_subset))
            self.view_indices = sampled
        self._select(self.view_indices)
        self._unseen = list(range(len(self.view_indices)))

    def _select(self, idx):
        idx = np.asarray(idx)
        self.images = self.images[idx]
        self.c2w = self.c2w[idx]
        self.fx, self.fy = self.fx[idx], self.fy[idx]
        self.cx, self.cy = self.cx[idx], self.cy[idx]
        self.unedited_images = self.images.copy()

    def __len__(self) -> int:
        return len(self.view_indices)

    def camera(self, i: int):
        from ..cameras import make_camera

        return make_camera(
            self.c2w[i], self.fx[i], self.fy[i], self.cx[i], self.cy[i], self.width, self.height
        )

    def cameras_stacked(self):
        from ..cameras import Camera
        import jax.numpy as jnp

        return Camera(
            c2w=jnp.asarray(self.c2w[:, :3, :4]),
            fx=jnp.asarray(self.fx),
            fy=jnp.asarray(self.fy),
            cx=jnp.asarray(self.cx),
            cy=jnp.asarray(self.cy),
            width=self.width,
            height=self.height,
        )

    def next_train(self) -> tuple[int, np.ndarray]:
        """Random unseen view; re-populate when exhausted (gc_datamanager.py:213-235)."""
        i = self._unseen.pop(self._rng.randint(0, len(self._unseen) - 1))
        if not self._unseen:
            self._unseen = list(range(len(self.view_indices)))
        return i, self.images[i]

    def image(self, i: int) -> np.ndarray:
        return self.images[i]

    def eval_indices(self, max_views: int = 8) -> list[int]:
        """Views used for periodic image-metric eval. The reference's default
        split is train_split_fraction=1.0 (gc_dataparser_ns.py:64 — eval =
        train views); subsample evenly to bound eval cost."""
        n = len(self)
        if n <= max_views:
            return list(range(n))
        stride = n / max_views
        return [int(i * stride) for i in range(max_views)]

    def write_back(self, i: int, image: np.ndarray) -> None:
        """Replace a cached train image with its edited version (ad_pipeline.py:241-242)."""
        self.images[i] = np.asarray(image, np.float32)

    def reset_images(self) -> None:
        """Viewer 'reset' behavior: restore unedited images (gc_trainer.py:136-144)."""
        self.images = self.unedited_images.copy()

    def load_masks(self) -> dict[int, np.ndarray]:
        """Precomputed object masks from the scene's ``mask_npy/`` sidecars
        (gc_dataset.py:129-158), keyed by (subsetted) view index. Empty dict if
        the scene has none — masks are optional (reference README.md:110-116)."""
        out: dict[int, np.ndarray] = {}
        files = self.parsed.mask_filenames
        if not files:
            return out
        for local_i, global_i in enumerate(self.view_indices):
            path = files[global_i]
            if Path(path).exists():
                m = np.load(path).astype(np.float32)
                out[local_i] = m.squeeze()
        return out
