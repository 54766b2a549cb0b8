"""Image resizing with torch F.interpolate semantics, as separable matmuls.

The Real-ESRGAN degradation resizes with randomly chosen 'area' / 'bilinear'
/ 'bicubic' modes (dataset/realesrgan.py:225-226, :256-258, :281-295). To
match outputs, these re-implement torch's semantics exactly:

  * bilinear, align_corners=False: src = (dst + 0.5) * in/out - 0.5, borders
    clamped;
  * bicubic, align_corners=False: cubic convolution with a = -0.75 (torch's
    coefficient; NOTE jax.image.resize uses Keys a=-0.5, hence this custom
    implementation);
  * area: adaptive average pooling (integral overlap weights).

TPU-first design: a resize is two small matrix multiplications
out = W_h @ img @ W_w^T with host-precomputed weight matrices — dense MXU
work instead of gathers, and trivially fused by XLA. Weights are cached per
(in, out, mode).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    w = np.zeros((out_size, in_size), np.float64)
    if out_size == in_size:
        np.fill_diagonal(w, 1.0)
        return w
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        i0 = min(max(f, 0), in_size - 1)
        i1 = min(max(f + 1, 0), in_size - 1)
        w[i, i0] += 1 - t
        w[i, i1] += t
    return w


def _cubic(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    return np.where(
        at <= 1,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )


def _bicubic_weights(in_size: int, out_size: int) -> np.ndarray:
    w = np.zeros((out_size, in_size), np.float64)
    if out_size == in_size:
        np.fill_diagonal(w, 1.0)
        return w
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        f = int(np.floor(src))
        t = src - f
        for k in range(-1, 3):
            idx = min(max(f + k, 0), in_size - 1)
            w[i, idx] += _cubic(np.asarray(k - t))
    return w


def _area_weights(in_size: int, out_size: int) -> np.ndarray:
    """adaptive_avg_pool1d weights (torch 'area' mode)."""
    w = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        w[i, start:end] = 1.0 / (end - start)
    return w


_WEIGHT_FNS = {
    "bilinear": _bilinear_weights,
    "bicubic": _bicubic_weights,
    "area": _area_weights,
}


@functools.lru_cache(maxsize=4096)
def _weights(in_size: int, out_size: int, mode: str):
    # cache as numpy: a jnp array materialized inside a jit trace would be a
    # tracer and caching it across traces leaks (JAX >= 0.9 const handling)
    return np.ascontiguousarray(_WEIGHT_FNS[mode](in_size, out_size), dtype=np.float32)


def resize(img, out_h: int, out_w: int, mode: str = "bilinear"):
    """img (B, H, W, C) -> (B, out_h, out_w, C), torch F.interpolate parity."""
    b, h, w, c = img.shape
    wh = _weights(h, out_h, mode)
    ww = _weights(w, out_w, mode)
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x.astype(img.dtype)


def resize_by_scale(img, scale: float, mode: str = "bilinear", snap: int = 1):
    """F.interpolate(scale_factor=...) parity: out = floor(in * scale),
    optionally snapped to a multiple of ``snap`` (bounded-compile TPU mode)."""
    b, h, w, c = img.shape
    oh = int(h * scale)
    ow = int(w * scale)
    if snap > 1:
        oh = max(snap, round(oh / snap) * snap)
        ow = max(snap, round(ow / snap) * snap)
    return resize(img, oh, ow, mode)
