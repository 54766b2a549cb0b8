"""Color alignment post-processing: AdaIN and wavelet low-frequency transfer.

Jitted NHWC re-implementations of infer/wavelet_color_fix.py: adain transfers
per-channel mean/std from the source (upscaled LQ) to the target (SR output)
(:44-74); wavelet swaps the target's low-frequency band for the source's via
a 5-level dilated-3x3 blur pyramid (:77-125). Inputs in [0,1], NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _mean_std(x, eps=1e-5):
    # per-channel over spatial dims; torch .var() uses Bessel correction
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    mean = flat.mean(axis=1, keepdims=True)
    n = h * w
    var = flat.var(axis=1, keepdims=True) * (n / max(n - 1, 1)) + eps
    return mean.reshape(b, 1, 1, c), jnp.sqrt(var).reshape(b, 1, 1, c)


def adain_color_fix(target, source):
    """Re-normalize target channels to the source's statistics
    (adaptive_instance_normalization, infer/wavelet_color_fix.py:60-74)."""
    s_mean, s_std = _mean_std(source)
    t_mean, t_std = _mean_std(target)
    return (target - t_mean) / t_std * s_std + s_mean


# numpy at module level, jnp at use: a module-level jnp constant would
# initialize the device backend at import time (hangs every CLI when the
# remote TPU tunnel is down, and pins the platform before callers can
# force CPU)
_WAVELET_KERNEL = np.asarray(
    [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]],
    np.float32,
)


def wavelet_blur(x, radius: int):
    """Dilated 3x3 blur with replicate padding (infer/wavelet_color_fix.py:77-96)."""
    c = x.shape[-1]
    kernel = jnp.tile(
        jnp.asarray(_WAVELET_KERNEL, x.dtype)[:, :, None, None], (1, 1, 1, c)
    )
    pad = ((0, 0), (radius, radius), (radius, radius), (0, 0))
    xp = jnp.pad(x, pad, mode="edge")
    return jax.lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        rhs_dilation=(radius, radius),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def wavelet_decomposition(x, levels: int = 5):
    high = jnp.zeros_like(x)
    for i in range(levels):
        low = wavelet_blur(x, 2**i)
        high = high + (x - low)
        x = low
    return high, x  # (high_freq, low_freq)


def wavelet_color_fix(target, source):
    """target high-freq + source low-freq (wavelet_reconstruction,
    infer/wavelet_color_fix.py:114-125)."""
    t_high, _ = wavelet_decomposition(target)
    _, s_low = wavelet_decomposition(source)
    return t_high + s_low
