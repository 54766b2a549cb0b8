"""Image quality metrics (PSNR / SSIM), jitted.

The reference publishes no eval code (its README points at qualitative
imgsli comparisons); these utilities support quantitative evaluation of SR
outputs against ground truth on the RealSR/DRealSR-style protocols.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(a, b, max_val: float = 1.0):
    """Peak signal-to-noise ratio over NHWC images; returns (B,)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    mse = jnp.mean((a - b) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a, b, max_val: float = 1.0, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over NHWC images (per-channel gaussian-windowed, standard
    Wang et al. constants); returns (B,)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c = a.shape[-1]
    w = _gaussian_window(window_size, sigma)
    kernel = jnp.tile(w[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a = filt(a)
    mu_b = filt(b)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    sig_aa = filt(a * a) - mu_aa
    sig_bb = filt(b * b) - mu_bb
    sig_ab = filt(a * b) - mu_ab

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_aa + mu_bb + c1) * (sig_aa + sig_bb + c2)
    )
    return s.mean(axis=(1, 2, 3))
