"""Native (C++) runtime components, loaded via ctypes.

``get_loader()`` returns the compiled scene-loader library (building it
with g++ on first use, cached next to the source) or None when no
toolchain/zlib is available — callers fall back to the pure-Python path.
"""

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_lock = threading.Lock()
_lib = None
_lib_tried = False


def _build_lib() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    out = os.path.join(_DIR, f"_loader_{tag}.so")
    if os.path.exists(out):
        return out
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-lz", "-o", out + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
    except (OSError, subprocess.SubprocessError):
        return None
    return out


def get_loader() -> Optional[ctypes.CDLL]:
    """The native loader library, or None (then use the Python path)."""
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if os.environ.get("AONERF_NO_NATIVE"):
            return None
        path = _build_lib()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.aonerf_load_scene.restype = ctypes.c_int
        lib.aonerf_load_scene.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
        ]
        lib.aonerf_decode_png.restype = ctypes.c_int
        lib.aonerf_decode_png.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ]
        lib.aonerf_decode_png_u8.restype = ctypes.c_int
        lib.aonerf_decode_png_u8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_scene_native(
    paths,
    c2ws: np.ndarray,
    directions: np.ndarray,
    h: int,
    w: int,
    white_bkgd: bool,
    rays_o: np.ndarray,
    rays_d: np.ndarray,
    rgbs: np.ndarray,
    alphas: Optional[np.ndarray] = None,
    n_threads: int = 0,
) -> bool:
    """Fill the preallocated flat buffers from PNGs + camera poses.

    Returns True on success; False means fall back to the Python loader
    (missing toolchain, unsupported PNG flavor, or size mismatch that needs
    PIL resizing).
    """
    lib = get_loader()
    if lib is None:
        return False
    c2ws = np.ascontiguousarray(c2ws, np.float32).reshape(len(paths), 12)
    directions = np.ascontiguousarray(directions, np.float32).reshape(-1, 3)
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    rc = lib.aonerf_load_scene(
        arr, len(paths), _fptr(c2ws), _fptr(directions), h, w,
        int(white_bkgd), _fptr(rays_o), _fptr(rays_d), _fptr(rgbs),
        _fptr(alphas) if alphas is not None else None, n_threads,
    )
    return rc == 0


def decode_png_u8_native(path: str, w: int, h: int) -> Optional[np.ndarray]:
    """Decode one PNG to an (h, w, 4) u8 RGBA array (alpha=255 when the
    file has none). None -> caller falls back to PIL (e.g. needs resize)."""
    lib = get_loader()
    if lib is None:
        return None
    out = np.empty((h, w, 4), np.uint8)
    rc = lib.aonerf_decode_png_u8(
        path.encode(), w, h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    return out if rc == 0 else None


def decode_png_native(
    path: str, w: int, h: int, white_bkgd: bool,
    rgb: np.ndarray, alpha: Optional[np.ndarray] = None,
) -> bool:
    """Decode one PNG into (h*w,3) rgb (+(h*w,) alpha). False -> fallback."""
    lib = get_loader()
    if lib is None:
        return False
    rc = lib.aonerf_decode_png(
        path.encode(), w, h, int(white_bkgd), _fptr(rgb),
        _fptr(alpha) if alpha is not None else None,
    )
    return rc == 0
