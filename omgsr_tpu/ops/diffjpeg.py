"""DiffJPEG: differentiable/batched JPEG compression emulation, jitted.

Re-implements the reference's DiffJPEG stack (dataset/degradations.py:
885-1364): RGB->YCbCr (ITU-R 601 with the exact matrices, :922-940), 2x2
chroma average-pool subsampling (:946-966), 8x8 block DCT with alpha
scaling (:994-1018), Y/C quantization by the standard tables scaled by the
quality->factor mapping (:905-918), then the inverse path with chroma
nearest upsampling, and pad-to-16 handling (:1322-1364).

Differences by design: blocks are processed as (B, nb, 8, 8) einsums with a
separable DCT basis (same math, MXU-shaped), and rounding is hard round by
default (the degradation uses differentiable=False,
dataset/realesrgan.py:98) with the cubic soft-round available for
gradient-mode use.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

# quantization tables (transposed, exactly as the reference stores them,
# dataset/degradations.py:888-898)
_Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99]],
    dtype=np.float32,
).T

_C_TABLE = np.full((8, 8), 99, np.float32)
_C_TABLE[:4, :4] = np.array(
    [[17, 18, 24, 47], [18, 21, 26, 66], [24, 26, 56, 99], [47, 66, 99, 99]], np.float32
).T

_RGB2YCBCR = np.array(
    [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5], [0.5, -0.418688, -0.081312]],
    np.float32,
).T
_YCBCR_SHIFT = np.array([0.0, 128.0, 128.0], np.float32)

_YCBCR2RGB = np.array(
    [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]], np.float32
).T

_DCT = np.zeros((8, 8, 8, 8), np.float32)
for _x, _y, _u, _v in itertools.product(range(8), repeat=4):
    _DCT[_x, _y, _u, _v] = np.cos((2 * _x + 1) * _u * np.pi / 16) * np.cos(
        (2 * _y + 1) * _v * np.pi / 16
    )
_ALPHA = np.array([1.0 / np.sqrt(2)] + [1.0] * 7)
_DCT_SCALE = (np.outer(_ALPHA, _ALPHA) * 0.25).astype(np.float32)

_IDCT = np.zeros((8, 8, 8, 8), np.float32)
for _x, _y, _u, _v in itertools.product(range(8), repeat=4):
    _IDCT[_x, _y, _u, _v] = np.cos((2 * _u + 1) * _x * np.pi / 16) * np.cos(
        (2 * _v + 1) * _y * np.pi / 16
    )
_IDCT_ALPHA = np.outer(_ALPHA, _ALPHA).astype(np.float32)


def quality_to_factor(quality):
    """quality [1, 100] -> table scaling factor (reference :905-918)."""
    quality = jnp.asarray(quality, jnp.float32)
    q = jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2.0)
    return q / 100.0


def diff_round(x):
    """Cubic soft round (reference :901-903), for differentiable mode."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def _blocks(x):
    """(B, H, W) -> (B, H/8*W/8, 8, 8), row-major block order."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, -1, 8, 8)


def _merge(x, h, w):
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _dct(x):
    return jnp.asarray(_DCT_SCALE) * jnp.einsum("bnxy,xyuv->bnuv", x - 128.0, jnp.asarray(_DCT))


def _idct(x):
    return 0.25 * jnp.einsum("bnxy,xyuv->bnuv", x * jnp.asarray(_IDCT_ALPHA), jnp.asarray(_IDCT)) + 128.0


def diffjpeg(img, quality, differentiable: bool = False):
    """JPEG round-trip. img (B, H, W, 3) RGB in [0,1]; quality scalar or (B,).

    Returns the compressed-then-decompressed image in [0,1].
    """
    rounding = diff_round if differentiable else jnp.round
    b, h, w, _ = img.shape
    factor = quality_to_factor(jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (b,)))
    f = factor[:, None, None, None]

    h_pad = (16 - h % 16) % 16
    w_pad = (16 - w % 16) % 16
    x = jnp.pad(img.astype(jnp.float32), ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad

    # to YCbCr
    ycc = jnp.einsum("bhwc,ck->bhwk", x * 255.0, jnp.asarray(_RGB2YCBCR)) + jnp.asarray(_YCBCR_SHIFT)
    y = ycc[..., 0]
    # 2x2 average chroma subsample
    cbcr = ycc[..., 1:].reshape(b, hp // 2, 2, wp // 2, 2, 2).mean(axis=(2, 4))
    cb, cr = cbcr[..., 0], cbcr[..., 1]

    yt = jnp.asarray(_Y_TABLE)
    ct = jnp.asarray(_C_TABLE)
    yq = rounding(_dct(_blocks(y)) / (yt * f))
    cbq = rounding(_dct(_blocks(cb)) / (ct * f))
    crq = rounding(_dct(_blocks(cr)) / (ct * f))

    # decompress
    y2 = _merge(_idct(yq * (yt * f)), hp, wp)
    cb2 = _merge(_idct(cbq * (ct * f)), hp // 2, wp // 2)
    cr2 = _merge(_idct(crq * (ct * f)), hp // 2, wp // 2)

    # nearest 2x chroma upsample
    def up(c):
        return jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)

    ycc2 = jnp.stack([y2, up(cb2), up(cr2)], axis=-1)
    rgb = jnp.einsum("bhwc,ck->bhwk", ycc2 + jnp.asarray([0.0, -128.0, -128.0]), jnp.asarray(_YCBCR2RGB))
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :].astype(img.dtype)
