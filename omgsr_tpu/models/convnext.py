"""DINOv3 ConvNeXt backbone (feature extractor for DISTS loss + GAN disc).

Re-implements the capability the reference vendors from facebookresearch/
dinov3 (dinov3/models/convnext.py:116-306; loaded via torch.hub at
dinov3_gan/dinov3_convnext_disc.py:162-166). OMGSR uses only the first three
stages' feature maps (dinov3_gan/dinov3_convnext_dists.py:63-70).

Structure per stage i: downsample (stem 4x4/s4 for i=0, else LN+conv 2x2/s2)
then depth_i ConvNeXt blocks (dwconv 7x7 -> LN -> MLP x4 gelu -> gamma scale
-> residual). NHWC; LN eps 1e-6. Param paths mirror the torch module tree
(downsample_layers.0.0, stages.2.5.dwconv, ...).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.configs import ConvNeXtConfig
from omgsr_tpu.models.layers import (
    conv2d,
    dense,
    depthwise_conv2d,
    gelu,
    init_conv,
    init_dense,
    init_norm,
    layer_norm,
)

_EPS = 1e-6


def _init_block(key, dim, ls_init, dtype):
    ks = jax.random.split(key, 3)
    return {
        "dwconv": init_conv(ks[0], 7, 7, 1, dim, dtype=dtype),  # depthwise: (7,7,1,C)
        "norm": init_norm(dim, dtype),
        "pwconv1": init_dense(ks[1], dim, 4 * dim, dtype=dtype),
        "pwconv2": init_dense(ks[2], 4 * dim, dim, dtype=dtype),
        "gamma": jnp.full((dim,), ls_init, dtype),
    }


def init_convnext(
    key,
    cfg: ConvNeXtConfig,
    dtype=jnp.float32,
    num_stages: int = 4,
    with_final_norm: bool = False,
):
    """with_final_norm adds the model-level LayerNorm the vendored ConvNeXt
    applies over [pooled-cls | patch] tokens in forward_features
    (convnext.py:177,224-227) — needed by the probe/hub paths; the
    DISTS/discriminator feature extractors never reach it."""
    dims = list(cfg.dims)
    keys = iter(jax.random.split(key, 8 + sum(cfg.depths)))
    params = {"downsample_layers": {}, "stages": {}}
    if with_final_norm:
        params["norm"] = init_norm(dims[-1], dtype)
    # stem: conv 4x4/s4 + channels-first LN
    params["downsample_layers"]["0"] = {
        "0": init_conv(next(keys), 4, 4, 3, dims[0], dtype=dtype),
        "1": init_norm(dims[0], dtype),
    }
    for i in range(1, num_stages):
        params["downsample_layers"][str(i)] = {
            "0": init_norm(dims[i - 1], dtype),
            "1": init_conv(next(keys), 2, 2, dims[i - 1], dims[i], dtype=dtype),
        }
    for i in range(num_stages):
        params["stages"][str(i)] = {
            str(j): _init_block(next(keys), dims[i], cfg.layer_scale_init_value, dtype)
            for j in range(cfg.depths[i])
        }
    return params


def _block(p, x):
    h = depthwise_conv2d(p["dwconv"], x, padding=3)
    h = layer_norm(p["norm"], h, _EPS)
    h = dense(p["pwconv1"], h)
    h = gelu(h, approximate=False)
    h = dense(p["pwconv2"], h)
    h = p["gamma"].astype(h.dtype) * h
    return x + h


def convnext_features(params, x, num_stages: int = 3):
    """NHWC image (ImageNet-normalized) -> list of per-stage NHWC feature maps.

    Mirrors _get_intermediate_layers(n=3) in the reference
    (dinov3_gan/dinov3_convnext_disc.py:179-185).
    """
    feats = []
    for i in range(num_stages):
        dl = params["downsample_layers"][str(i)]
        if i == 0:
            x = conv2d(dl["0"], x, stride=4, padding="VALID")
            x = layer_norm(dl["1"], x, _EPS)
        else:
            x = layer_norm(dl["0"], x, _EPS)
            x = conv2d(dl["1"], x, stride=2, padding="VALID")
        for j in sorted(params["stages"][str(i)], key=int):
            x = _block(params["stages"][str(i)][j], x)
        feats.append(x)
    return feats


def convnext_forward_features(params, x):
    """forward_features (convnext.py:207-235): all 4 stages, the global
    -average-pooled 'cls' token concatenated ahead of the flattened patch
    tokens, final LayerNorm over everything. Returns the same key layout as
    the ViT so the probes/dinotxt consumers are backbone-agnostic."""
    last = convnext_features(params, x, num_stages=4)[-1]
    b, h, w, c = last.shape
    tokens = jnp.concatenate(
        [jnp.mean(last, axis=(1, 2))[:, None], last.reshape(b, h * w, c)], axis=1
    )
    normed = layer_norm(params["norm"], tokens, 1e-6)
    return {
        "x_norm_clstoken": normed[:, 0],
        "x_storage_tokens": normed[:, 1:1],  # no registers (convnext.py:185)
        "x_norm_patchtokens": normed[:, 1:],
        "x_prenorm": tokens,
    }


# numpy at module level (import-time jnp would initialize the backend);
# broadcasting numpy against a traced array converts at use
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def normalize_from_pm1(x):
    """[-1,1] NHWC image -> ImageNet-normalized (reference
    dinov3_gan/dinov3_convnext_dists.py:72-74)."""
    x01 = x * 0.5 + 0.5
    return (x01 - IMAGENET_MEAN.astype(x.dtype)) / IMAGENET_STD.astype(x.dtype)
