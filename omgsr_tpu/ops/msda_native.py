"""ctypes binding + on-demand build for the native ms_deform_attn kernel.

Builds native/msda.cpp into libmsda.so with g++ on first use (cached next to
the source). pybind11 is not available in this image; the C ABI + ctypes is
the binding path (see repo docs)."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "msda.cpp"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libmsda.so"))

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.ms_deform_attn_forward_cpu.restype = None
    lib.ms_deform_attn_forward_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ] + [ctypes.c_int64] * 7
    _lib = lib
    return lib


def ms_deform_attn_cpu(value, spatial_shapes, sampling_locations, attention_weights):
    """numpy forward; same contract as ops.ms_deform_attn.ms_deform_attn."""
    lib = load_library()
    value = np.ascontiguousarray(value, np.float32)
    shapes = np.ascontiguousarray(spatial_shapes, np.int64)
    locs = np.ascontiguousarray(sampling_locations, np.float32)
    weights = np.ascontiguousarray(attention_weights, np.float32)
    b, s, m, d = value.shape
    _, q, _, L, p, _ = locs.shape
    out = np.zeros((b, q, m * d), np.float32)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.ms_deform_attn_forward_cpu(
        ptr(value, ctypes.c_float),
        ptr(shapes, ctypes.c_int64),
        ptr(locs, ctypes.c_float),
        ptr(weights, ctypes.c_float),
        ptr(out, ctypes.c_float),
        b, s, m, d, q, L, p,
    )
    return out
