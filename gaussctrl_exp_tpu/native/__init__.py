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


def _build() -> Optional[Path]:
    src = _DIR / "plyio.cpp"
    out = _DIR / "libplyio.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(src), "-o", str(out)],
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
    path = _build()
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
