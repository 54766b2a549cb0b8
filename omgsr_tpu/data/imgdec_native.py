"""ctypes binding for the native JPEG/PNG decoder (native/imgdec.cpp).

Used as PairedDataset's fast decode path: the decode runs entirely in C
(GIL released by ctypes), so loader threads truly parallelize. Falls back
to PIL when the library can't be built or a file fails to decode.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "imgdec.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libimgdec.so"))

_lib = None
_unavailable = False


def load_library():
    global _lib, _unavailable
    if _lib is not None or _unavailable:
        return _lib
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-lpng", "-o", _SO],
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        for name in ("decode_jpeg_rgb", "decode_png_rgb"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
            ]
        _lib = lib
    except Exception:
        _unavailable = True
    return _lib


_MAX_BYTES = 8192 * 8192 * 3  # 64MP cap


def decode_rgb(path: str) -> np.ndarray | None:
    """Decode a .jpg/.jpeg/.png file to (H, W, 3) uint8; None on failure
    (caller falls back to PIL)."""
    lib = load_library()
    if lib is None:
        return None
    ext = os.path.splitext(path)[1].lower()
    if ext in (".jpg", ".jpeg"):
        fn = lib.decode_jpeg_rgb
    elif ext == ".png":
        fn = lib.decode_png_rgb
    else:
        return None
    buf = np.empty(_MAX_BYTES, np.uint8)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    rc = fn(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _MAX_BYTES,
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()
