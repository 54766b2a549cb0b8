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


# ---- masked variants for bucket-padded canvases ---------------------------
#
# The serving daemon compiles one SR graph per size BUCKET and reflect-pads
# each request up to the bucket shape; the color fix must behave as if it ran
# on the cropped (h, w) image (that is what the CLI path computes). These
# variants take the true extent as traced scalars so ONE compiled graph
# serves every request in the bucket, fix included — no separate fix
# dispatch, no per-request recompile. Both are EXACT (to float tolerance)
# equivalents of crop -> fix: adain via masked statistics, wavelet via
# re-replicating the valid region's edge into the pad before every blur
# level (an edge-padded conv on that canvas sees exactly the replicate
# continuation crop-then-fix would).


def _valid_mask(shape, h, w, dtype):
    H, W = shape[1], shape[2]
    rows = (jnp.arange(H) < h)[:, None]
    cols = (jnp.arange(W) < w)[None, :]
    return (rows & cols)[None, :, :, None].astype(dtype)


def _replicate_into_pad(x, h, w):
    """Overwrite everything beyond (h, w) with replicate padding of the
    valid region (clamped gathers), per canvas."""
    H, W = x.shape[1], x.shape[2]
    x = jnp.take(x, jnp.minimum(jnp.arange(H), h - 1), axis=1)
    return jnp.take(x, jnp.minimum(jnp.arange(W), w - 1), axis=2)


def _masked_mean_std(x, mask, n, eps=1e-5):
    # matches _mean_std on the cropped image: population var * n/(n-1) + eps
    n = n.astype(x.dtype)
    xm = x * mask
    mean = xm.sum(axis=(1, 2), keepdims=True) / n
    sq = ((x - mean) ** 2) * mask
    var = sq.sum(axis=(1, 2), keepdims=True) / jnp.maximum(n - 1.0, 1.0) + eps
    return mean, jnp.sqrt(var)


def masked_adain_color_fix(target, source, h, w):
    """adain_color_fix restricted to the valid (h, w) region of padded
    canvases; the pad region of the output is unspecified (cropped by the
    caller)."""
    mask = _valid_mask(target.shape, h, w, target.dtype)
    n = h * w
    s_mean, s_std = _masked_mean_std(source, mask, n)
    t_mean, t_std = _masked_mean_std(target, mask, n)
    return (target - t_mean) / t_std * s_std + s_mean


def masked_wavelet_color_fix(target, source, h, w):
    """wavelet_color_fix equivalent on padded canvases: each blur level
    re-replicates the valid region's edges into the pad first, so valid
    pixels see the same taps as crop -> wavelet_color_fix."""

    def decomposition(x, levels=5):
        high = jnp.zeros_like(x)
        for i in range(levels):
            x = _replicate_into_pad(x, h, w)
            low = wavelet_blur(x, 2**i)
            high = high + (x - low)
            x = low
        return high, x

    t_high, _ = decomposition(target)
    _, s_low = decomposition(source)
    return t_high + s_low


# per-request align selector (serving): indices into the switched batch fix
ALIGN_IDX = {"nofix": 0, "adain": 1, "wavelet": 2}


def switched_color_fix_batch(target01, source01, hw, align_idx):
    """Per-image color fix on a bucket-padded batch with traced parameters:
    hw (B, 2) int32 true extents, align_idx (B,) int32 per ALIGN_IDX. One
    compiled graph covers every (method, true-size) combination in the
    bucket — the serving daemon fuses this onto the tail of the SR graph."""

    def per_image(t, s, hw1, idx):
        t, s = t[None], s[None]
        out = jax.lax.switch(
            idx,
            [
                lambda t, s: t,
                lambda t, s: masked_adain_color_fix(t, s, hw1[0], hw1[1]),
                lambda t, s: masked_wavelet_color_fix(t, s, hw1[0], hw1[1]),
            ],
            t,
            s,
        )
        return out[0]

    return jax.vmap(per_image)(target01, source01, hw, align_idx)
