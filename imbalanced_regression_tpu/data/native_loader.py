"""ctypes binding for the native C++ batch JPEG loader (``native/loader.cc``).

Builds the shared library on first use (g++ -O3, links system libjpeg) and
caches it next to the source. Falls back to PIL per-image when the toolchain
or libjpeg is unavailable, and for images the native decoder rejects
(non-JPEG formats, truncated files).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "loader.cc")
_SO = os.path.join(_NATIVE_DIR, "libdirloader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO, _SRC, "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native loader build failed (%s); falling back to PIL", e)
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.decode_resize_batch.restype = ctypes.c_int
            lib.decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except OSError as e:
            logger.warning("native loader unusable (%s); falling back to PIL", e)
            _build_failed = True
    return _lib


def _pil_decode(path: str, img_size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as img:
        img = img.convert("RGB").resize((img_size, img_size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)


def decode_resize_batch(paths: list[str], img_size: int, threads: int | None = None) -> np.ndarray:
    """Decode+resize a list of image files to a uint8 [N, S, S, 3] batch.

    Uses the native multithreaded libjpeg path when available; any image it
    cannot handle is decoded via PIL instead."""
    n = len(paths)
    out = np.zeros((n, img_size, img_size, 3), np.uint8)
    if n == 0:
        return out
    lib = get_lib()
    if lib is None:
        for i, p in enumerate(paths):
            out[i] = _pil_decode(p, img_size)
        return out

    status = np.zeros(n, np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    threads = threads or min(8, max(1, (os.cpu_count() or 1)))
    lib.decode_resize_batch(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img_size, img_size, threads,
    )
    for i in np.nonzero(status == 0)[0]:
        out[i] = _pil_decode(paths[i], img_size)
    return out
