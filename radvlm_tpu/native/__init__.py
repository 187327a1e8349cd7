"""Native (C++) host pipeline: fused anyres tile extraction.

ctypes bindings over `anyres.cc` (bicubic resize + pad + tile, OpenMP). The
library auto-builds on first import if a compiler is available; callers use
`available()` and fall back to the PIL path (the golden-parity reference)
otherwise. Enable in the serving/eval hot path with RADVLM_NATIVE_ANYRES=1.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libanyres.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False
_build_lock = threading.Lock()  # serialize first-use builds across threads


def _build() -> bool:
    src = os.path.join(_DIR, "anyres.cc")
    cmd = [
        "c++", "-O3", "-fopenmp", "-shared", "-fPIC", src, "-o", _SO,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.info("native anyres build failed (falling back to PIL): %s", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _build_lock:  # two prefetch threads must not race the c++ build
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src = os.path.join(_DIR, "anyres.cc")
        # source may be absent in a built deployment: a prebuilt .so is used
        # as-is (getmtime on the missing source crashed available())
        stale = os.path.exists(src) and (
            not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(src)
        )
        if not os.path.exists(_SO) and not os.path.exists(src):
            return None
        if stale and not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError as e:
        log.info("native anyres load failed: %s", e)
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.anyres_tiles.argtypes = [u8p] + [ctypes.c_int] * 2 + [u8p] + [ctypes.c_int] * 5
    lib.anyres_tiles.restype = ctypes.c_int
    lib.resize_rgb.argtypes = [u8p] + [ctypes.c_int] * 2 + [u8p] + [ctypes.c_int] * 2
    lib.resize_rgb.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# Native JPEG decode (libjpeg) — the ingest-path analog of the anyres tiler.
# ---------------------------------------------------------------------------

_JPEG_SO = os.path.join(_DIR, "libjpegdec.so")
_jpeg_lib: Optional[ctypes.CDLL] = None
_jpeg_tried = False


def _build_jpeg() -> bool:
    src = os.path.join(_DIR, "jpeg.cc")
    cmd = ["c++", "-O3", "-shared", "-fPIC", src, "-o", _JPEG_SO, "-ljpeg"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.info("native jpeg build failed (falling back to PIL): %s", e)
        return False


def _load_jpeg() -> Optional[ctypes.CDLL]:
    global _jpeg_lib, _jpeg_tried
    with _build_lock:
        if _jpeg_lib is not None or _jpeg_tried:
            return _jpeg_lib
        _jpeg_tried = True
        src = os.path.join(_DIR, "jpeg.cc")
        stale = os.path.exists(src) and (
            not os.path.exists(_JPEG_SO)
            or os.path.getmtime(_JPEG_SO) < os.path.getmtime(src)
        )
        if not os.path.exists(_JPEG_SO) and not os.path.exists(src):
            return None
        if stale and not _build_jpeg():
            return None
    try:
        lib = ctypes.CDLL(_JPEG_SO)
    except OSError as e:
        log.info("native jpeg load failed: %s", e)
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    ip = ctypes.POINTER(ctypes.c_int)
    lib.jpeg_info.argtypes = [u8p, ctypes.c_int, ip, ip]
    lib.jpeg_info.restype = ctypes.c_int
    lib.jpeg_decode_rgb.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int]
    lib.jpeg_decode_rgb.restype = ctypes.c_int
    _jpeg_lib = lib
    return _jpeg_lib


def jpeg_available() -> bool:
    return _load_jpeg() is not None


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> uint8 [H, W, 3] RGB (grayscale expanded). Raises on
    malformed input; runs outside the GIL (prefetch-pool friendly)."""
    lib = _load_jpeg()
    if lib is None:
        raise RuntimeError("native jpeg library unavailable")
    buf = np.frombuffer(data, np.uint8)
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_info(buf, len(buf), ctypes.byref(h), ctypes.byref(w)) != 0:
        raise ValueError("invalid JPEG header")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_rgb(buf, len(buf), out, out.size)
    if rc != 0:
        raise ValueError(f"JPEG decode failed (rc={rc})")
    return out


def anyres_tiles(
    img: np.ndarray,
    tile_size: int,
    best_wh: Tuple[int, int],
    new_wh: Tuple[int, int],
) -> np.ndarray:
    """uint8 [H, W, 3] -> uint8 tiles [1 + grid, ts, ts, 3] (base first)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native anyres library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    best_w, best_h = best_wh
    new_w, new_h = new_wh
    n_tiles = 1 + (best_h // tile_size) * (best_w // tile_size)
    out = np.empty((n_tiles, tile_size, tile_size, 3), np.uint8)
    h, w = img.shape[:2]
    written = lib.anyres_tiles(
        img, h, w, out, tile_size, best_w, best_h, new_w, new_h
    )
    assert written == n_tiles, (written, n_tiles)
    return out


def resize_rgb(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native anyres library unavailable")
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    lib.resize_rgb(img, img.shape[0], img.shape[1], out, out_h, out_w)
    return out
