"""DINOv3-ConvNeXt DISTS perceptual loss.

Re-implements dinov3_gan/dinov3_convnext_dists.py: features are the RGB
image (in [0,1]) plus the first three ConvNeXt stages' maps passed through a
Hanning-window L2 pooling (filter 5 -> 3x3 window after endpoint trim,
stride 1, :7-29); the DISTS score combines per-channel mean similarity
(structure) and covariance similarity (texture) with uniform weights
1/(2*sum(channels)) and returns 1 - (dist1 + dist2), meaned (:86-108).

The ConvNeXt backbone is frozen — callers should lax.stop_gradient its
params or simply never differentiate w.r.t. them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.convnext import convnext_features, normalize_from_pm1


def _hanning_kernel():
    a = np.hanning(5)[1:-1]  # 3 taps
    g = np.outer(a, a)
    return (g / g.sum()).astype(np.float32)


# numpy at module level (import-time jnp would initialize the backend)
_L2POOL_KERNEL = _hanning_kernel()


def l2_pool(x, stride: int = 1):
    """sqrt(conv(x^2, hanning_3x3) + 1e-12), depthwise, pad 1."""
    c = x.shape[-1]
    k = jnp.tile(
        jnp.asarray(_L2POOL_KERNEL, jnp.float32)[:, :, None, None], (1, 1, 1, c)
    )
    y = jax.lax.conv_general_dilated(
        (x.astype(jnp.float32)) ** 2,
        k,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jnp.sqrt(y + 1e-12).astype(x.dtype)


def init_dists(convnext_params, chns):
    """Bundle frozen backbone params with the channel list [3, c1, c2, c3]."""
    return {"backbone": convnext_params, "channels": [3] + list(chns[:3])}


def _features(backbone_params, x):
    """x in [-1,1] NHWC -> [x01, l2pool(stage1), l2pool(stage2), l2pool(stage3)]."""
    x01 = x * 0.5 + 0.5
    h = normalize_from_pm1(x)
    feats = convnext_features(backbone_params, h, num_stages=3)
    return [x01] + [l2_pool(f) for f in feats]


def dists_loss(dists_state, x, y):
    """Scalar DISTS distance between images x, y in [-1,1] NHWC."""
    backbone = jax.lax.stop_gradient(dists_state["backbone"])
    channels = dists_state["channels"]
    w = 1.0 / (2.0 * sum(channels))
    feats0 = _features(backbone, x)
    feats1 = _features(backbone, y)
    c1 = c2 = 1e-6
    dist1 = 0.0
    dist2 = 0.0
    for f0, f1 in zip(feats0, feats1):
        f0 = f0.astype(jnp.float32)
        f1 = f1.astype(jnp.float32)
        x_mean = f0.mean(axis=(1, 2), keepdims=True)
        y_mean = f1.mean(axis=(1, 2), keepdims=True)
        s1 = (2 * x_mean * y_mean + c1) / (x_mean**2 + y_mean**2 + c1)
        dist1 = dist1 + (w * s1).sum(axis=3)

        x_var = ((f0 - x_mean) ** 2).mean(axis=(1, 2), keepdims=True)
        y_var = ((f1 - y_mean) ** 2).mean(axis=(1, 2), keepdims=True)
        xy_cov = (f0 * f1).mean(axis=(1, 2), keepdims=True) - x_mean * y_mean
        s2 = (2 * xy_cov + c2) / (x_var + y_var + c2)
        dist2 = dist2 + (w * s2).sum(axis=3)

    score = 1.0 - (dist1 + dist2)
    return score.mean()
