"""Spatial filtering: filter2D (reflect-pad per-sample kernels) and USM.

Re-implements dataset/degradations.py: filter2D (:772-796) — reflect padding
k//2 then conv with a per-sample (B, k, k) kernel applied to every channel —
and USMSharp (:829-848) — Gaussian-blur residual sharpening with a soft
threshold mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def filter2d(img, kernel):
    """img (B, H, W, C), kernel (B, k, k) or (k, k), reflect padding.

    Per-sample kernels become a grouped conv over B*C feature groups (the
    reference's exact trick, dataset/degradations.py:788-796).
    """
    if kernel.ndim == 2:
        kernel = kernel[None]
    b, h, w, c = img.shape
    k = kernel.shape[-1]
    if k % 2 != 1:
        raise ValueError("Wrong kernel size")
    p = k // 2
    x = jnp.pad(img.astype(jnp.float32), ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    if kernel.shape[0] == 1:
        kern = jnp.tile(kernel[0][:, :, None, None].astype(jnp.float32), (1, 1, 1, c))
        out = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
    else:
        # (B,H,W,C) -> (1, H, W, B*C) with per-(b,c) kernels
        xg = x.transpose(1, 2, 0, 3).reshape(1, h + 2 * p, w + 2 * p, b * c)
        kern = jnp.repeat(kernel.astype(jnp.float32), c, axis=0)  # (B*C, k, k)
        kern = kern.transpose(1, 2, 0)[:, :, None, :]  # (k, k, 1, B*C)
        out = jax.lax.conv_general_dilated(
            xg, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * c,
        )
        out = out.reshape(h, w, b, c).transpose(2, 0, 1, 3)
    return out.astype(img.dtype)


def _gaussian_kernel_1d(size: int, sigma: float = 0.0) -> np.ndarray:
    """cv2.getGaussianKernel semantics: sigma<=0 -> 0.3*((size-1)*0.5-1)+0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((size - 1) * 0.5 - 1) + 0.8
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def usm_sharp(img, weight: float = 0.5, radius: int = 50, threshold: float = 10.0, sigma: float = 0.0):
    """Unsharp masking (USMSharp, dataset/degradations.py:829-848)."""
    if radius % 2 == 0:
        radius += 1
    k1 = _gaussian_kernel_1d(radius, sigma)
    kernel = jnp.asarray(np.outer(k1, k1))
    blur = filter2d(img, kernel)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2d(mask, kernel)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    return soft_mask * sharp + (1 - soft_mask) * img
