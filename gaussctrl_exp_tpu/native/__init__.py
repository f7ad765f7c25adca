"""Native (C++) host-side components, built on demand with g++ and loaded via
ctypes. The compute path stays JAX/Pallas; these cover the host runtime the
reference delegates to C++ libraries (open3d PLY IO, gc_dataparser_ns.py:447).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_IMGLIB: Optional[ctypes.CDLL] = None
_IMG_TRIED = False


def _build(name: str, extra: tuple[str, ...] = ()) -> Optional[Path]:
    src = _DIR / f"{name}.cpp"
    out = _DIR / f"lib{name}.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *extra, str(src), "-o", str(out)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return out
    except Exception:
        return None


def get_plyio() -> Optional[ctypes.CDLL]:
    """The plyio library, building it on first use; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = _build("plyio")
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.ply_open.restype = ctypes.c_void_p
    lib.ply_open.argtypes = [ctypes.c_char_p]
    lib.ply_num_vertices.restype = ctypes.c_long
    lib.ply_num_vertices.argtypes = [ctypes.c_void_p]
    lib.ply_has_rgb.restype = ctypes.c_int
    lib.ply_has_rgb.argtypes = [ctypes.c_void_p]
    lib.ply_read.restype = ctypes.c_int
    lib.ply_read.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.ply_close.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def get_imageio() -> Optional[ctypes.CDLL]:
    """The imageio library (JPEG decode + undistort + threaded batch loader),
    building it on first use; None if unavailable."""
    global _IMGLIB, _IMG_TRIED
    if _IMGLIB is not None or _IMG_TRIED:
        return _IMGLIB
    _IMG_TRIED = True
    path = _build("imageio", extra=("-pthread",))
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    lib.idct_test.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.img_open.restype = ctypes.c_void_p
    lib.img_open.argtypes = [ctypes.c_char_p]
    lib.img_width.restype = ctypes.c_int
    lib.img_width.argtypes = [ctypes.c_void_p]
    lib.img_height.restype = ctypes.c_int
    lib.img_height.argtypes = [ctypes.c_void_p]
    lib.img_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.img_close.argtypes = [ctypes.c_void_p]
    lib.undistort_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.load_undistort_batch.restype = ctypes.c_int
    lib.load_undistort_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int,
    ]
    _IMGLIB = lib
    return _IMGLIB
