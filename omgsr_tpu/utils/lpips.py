"""LPIPS perceptual metric (Zhang et al. 2018), VGG16 backbone.

The reference's eval protocol reports perceptual scores alongside PSNR/SSIM
(README.md:45-90 names the RealSR/DRealSR comparisons; the SR papers'
standard learned full-reference metric is LPIPS-VGG). No torchvision/lpips
wheels ship in this environment, so the VGG16 feature stack and the learned
linear calibration are owned here, with a porter from the official
checkpoint layouts — a torchvision ``vgg16`` state dict plus the ``lpips``
package's ``vgg.pth`` linear weights — so real-weight day is turnkey
(same pattern as `convert.port_dinov3_convnext` for DISTS).

Conventions match the repo: params are nested dicts keyed like the source
checkpoints, convs HWIO, activations NHWC, inputs in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg16 `features` conv indices, grouped by slice; LPIPS taps the
# activations at relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3 (a 2x2/2
# max-pool sits between consecutive slices)
VGG16_SLICES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
VGG16_CHANNELS = (64, 128, 256, 512, 512)

# the official ScalingLayer constants (inputs already in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips(key, dtype=jnp.float32):
    """Random-weight LPIPS tree (scores self-consistent, not comparable to
    published numbers — port real checkpoints with `port_lpips`)."""
    feats = {}
    cin = 3
    for slice_idxs, cout in zip(VGG16_SLICES, VGG16_CHANNELS):
        for idx in slice_idxs:
            key, k1 = jax.random.split(key)
            scale = 1.0 / np.sqrt(3 * 3 * cin)
            feats[str(idx)] = {
                "weight": (jax.random.normal(k1, (3, 3, cin, cout)) * scale).astype(dtype),
                "bias": jnp.zeros((cout,), dtype),
            }
            cin = cout
    lins = {}
    for i, c in enumerate(VGG16_CHANNELS):
        key, k1 = jax.random.split(key)
        lins[str(i)] = jax.random.uniform(k1, (c,), dtype, 0.0, 2.0 / c)
    return {"features": feats, "lins": lins}


def _conv(x, p):
    y = jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(x.dtype)


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg_slices(features, x_pm1):
    """x in [-1,1] NHWC -> the five LPIPS tap activations (post-ReLU)."""
    h = (x_pm1 - jnp.asarray(_SHIFT, x_pm1.dtype)) / jnp.asarray(_SCALE, x_pm1.dtype)
    taps = []
    for si, slice_idxs in enumerate(VGG16_SLICES):
        if si:
            h = _maxpool2(h)
        for idx in slice_idxs:
            h = jax.nn.relu(_conv(h, features[str(idx)]))
        taps.append(h)
    return taps


def lpips(params, x, y):
    """LPIPS distance between two [-1,1] NHWC batches -> (N,) scores.

    Per the official forward: unit-normalize each tap along channels
    (eps 1e-10 added to the norm), squared difference, 1x1 learned linear
    combination, spatial mean, sum over the five taps.
    """
    fx = vgg_slices(params["features"], x)
    fy = vgg_slices(params["features"], y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / (jnp.sqrt((a.astype(jnp.float32) ** 2).sum(-1, keepdims=True)) + 1e-10)
        b = b / (jnp.sqrt((b.astype(jnp.float32) ** 2).sum(-1, keepdims=True)) + 1e-10)
        d = (a - b) ** 2
        w = params["lins"][str(i)].astype(jnp.float32)
        total = total + (d * w).sum(-1).mean((-1, -2))
    return total


def port_lpips(vgg_pth, lins_pth, dtype=jnp.float32):
    """Official checkpoints -> LPIPS param tree.

    vgg_pth: torchvision ``vgg16`` state dict (.pth; classifier.* ignored),
    or an already-loaded dict. lins_pth: the ``lpips`` package's calibration
    weights (``lpips/weights/v0.1/vgg.pth``: keys ``lin{i}.model.1.weight``
    of shape (1, C, 1, 1)), or an already-loaded dict.
    """
    import torch

    sd_v = (
        vgg_pth if isinstance(vgg_pth, dict)
        else torch.load(vgg_pth, map_location="cpu", weights_only=True)
    )
    feats = {}
    for slice_idxs in VGG16_SLICES:
        for idx in slice_idxs:
            w = np.asarray(sd_v[f"features.{idx}.weight"].float().numpy())
            b = np.asarray(sd_v[f"features.{idx}.bias"].float().numpy())
            feats[str(idx)] = {
                "weight": jnp.asarray(np.transpose(w, (2, 3, 1, 0)), dtype),
                "bias": jnp.asarray(b, dtype),
            }
    sd_l = (
        lins_pth if isinstance(lins_pth, dict)
        else torch.load(lins_pth, map_location="cpu", weights_only=True)
    )
    lins = {}
    for i, c in enumerate(VGG16_CHANNELS):
        for k in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if k in sd_l:
                w = np.asarray(sd_l[k].float().numpy()).reshape(-1)
                break
        else:
            raise KeyError(f"no lin{i} weight in {list(sd_l)[:4]}...")
        if w.shape != (c,):
            raise ValueError(f"lin{i}: expected ({c},), got {w.shape}")
        lins[str(i)] = jnp.asarray(w, dtype)
    return {"features": feats, "lins": lins}
