"""Vision-aided GAN discriminator on frozen DINOv3-ConvNeXt features.

Re-implements dinov3_gan/dinov3_convnext_disc.py:80-279 functionally:
  * DiffAugment on the input image (:275);
  * frozen ConvNeXt first-3-stage features (:179-192);
  * per-level trainable decoder heads: N x [BlurPool(zero-pad, filt 4,
    stride 2) -> spectral-norm Conv3x3(stride s) -> LeakyReLU(0.2)] +
    BlurPool -> SN-Conv1x1 -> 1-logit map (:217-234), with different
    (channel-ratio, stride) configs for 512 vs 1024 resolution (:203-215);
  * multi-level BCE-with-logits, soft real label alpha=0.8 (:239-260, :270).

Spectral norm keeps an explicit power-iteration vector ``u`` per conv in a
separate state tree (torch hides this in a forward pre-hook); one iteration
runs per apply, u is stop-gradiented, and sigma divides the weight — the
same math torch's spectral_norm performs.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.convnext import convnext_features, normalize_from_pm1
from omgsr_tpu.losses.diffaug import diff_augment

_BLUR4 = np.asarray([1.0, 3.0, 3.0, 1.0])
_BLUR4 = np.outer(_BLUR4, _BLUR4)
_BLUR4 = (_BLUR4 / _BLUR4.sum()).astype(np.float32)


def blur_pool(x, stride: int = 2):
    """Antialiased downsample: zero-pad 1, 4x4 binomial filter, stride 2
    (BlurPool(pad_type='zero'), dinov3_gan/dinov3_convnext_disc.py:80-119)."""
    c = x.shape[-1]
    k = jnp.tile(jnp.asarray(_BLUR4)[:, :, None, None].astype(x.dtype), (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=(stride, stride),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _head_configs(resolution: int):
    """(channel_ratios, strides) per level (reference :203-215)."""
    if resolution == 1024:
        return [
            ([0.5, 1.0, 1.0, 1.0], [1, 2, 2, 2]),
            ([0.5, 0.5, 1.0, 1.0], [1, 1, 2, 2]),
            ([0.5, 0.5, 0.5, 1.0], [1, 1, 1, 2]),
        ]
    return [
        ([0.5, 1.0, 1.0], [2, 2, 2]),
        ([0.5, 0.5, 1.0], [1, 2, 2]),
        ([0.5, 0.5, 0.5], [1, 1, 2]),
    ]


def init_discriminator(key, channels, resolution: int = 512, dtype=jnp.float32, configs=None):
    """channels: first-3-stage ConvNeXt dims, e.g. (192, 384, 768) for large.

    Returns (params, sn_state, strides_meta): trainable head params,
    spectral-norm u vectors, per-level stride lists. ``configs`` overrides
    the resolution-keyed head depth (used for tiny-shape tests/dryruns).
    """
    from omgsr_tpu.models.layers import init_conv

    params = {"decoders": {}}
    sn_state = {"decoders": {}}
    cfgs = configs if configs is not None else _head_configs(resolution)
    keys = jax.random.split(key, 64)
    ki = 0
    for li, (ch, (ratios, strides)) in enumerate(zip(channels, cfgs)):
        layers = {}
        ulayers = {}
        cur = ch
        for j, (ratio, stride) in enumerate(zip(ratios, strides)):
            out = int(cur * ratio)
            layers[str(j)] = init_conv(keys[ki], 3, 3, cur, out, dtype=dtype)
            ulayers[str(j)] = {"u": jax.random.normal(keys[ki + 32], (out,), jnp.float32)}
            ki += 1
            cur = out
        layers["final"] = init_conv(keys[ki], 1, 1, cur, 1, dtype=dtype)
        ulayers["final"] = {"u": jax.random.normal(keys[ki + 32], (1,), jnp.float32)}
        ki += 1
        params["decoders"][str(li)] = layers
        sn_state["decoders"][str(li)] = ulayers
    # strip static metadata into a side table
    meta = {
        str(li): [s for s in cfgs[li][1]] for li in range(len(channels))
    }
    return params, sn_state, meta


def _spectral_normalize(kernel, u, eps=1e-12):
    """One power iteration; returns (W/sigma, new_u). kernel HWIO.

    torch reshapes conv weight to (out, in*kh*kw); here W2d is (fan_in, out).
    """
    shape = kernel.shape
    w2d = kernel.astype(jnp.float32).reshape(-1, shape[-1])  # (fan_in, out)
    u = jax.lax.stop_gradient(u)
    v = w2d @ u
    v = v / (jnp.linalg.norm(v) + eps)
    u_new = w2d.T @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + eps)
    u_new = jax.lax.stop_gradient(u_new)
    sigma = v @ (w2d @ u_new)
    return (w2d / sigma).reshape(shape).astype(kernel.dtype), u_new


def _head_apply(params, sn_state, strides, x):
    new_state = {}
    for j, stride in enumerate(strides):
        p = params[str(j)]
        if min(x.shape[1], x.shape[2]) < 2:
            raise ValueError(
                "discriminator head input collapsed to zero spatial size — "
                f"feature map {x.shape} too small for this resolution's head "
                "config; the input image must match the configured resolution"
            )
        x = blur_pool(x)
        wn, u = _spectral_normalize(p["kernel"], sn_state[str(j)]["u"])
        new_state[str(j)] = {"u": u}
        x = jax.lax.conv_general_dilated(
            x, wn.astype(x.dtype), (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["bias"].astype(x.dtype)
        x = jax.nn.leaky_relu(x, 0.2)
    x = blur_pool(x)
    p = params["final"]
    wn, u = _spectral_normalize(p["kernel"], sn_state["final"]["u"])
    new_state["final"] = {"u": u}
    x = jax.lax.conv_general_dilated(
        x, wn.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["bias"].astype(x.dtype)
    return x[..., 0], new_state  # logit map (B, h, w)


def _multi_level_bce(logits, for_real: bool, for_G: bool, alpha: float = 0.8):
    """Soft-label BCE summed over levels, spatial-meaned per sample
    (MultiLevelBCELoss, reference :239-260)."""
    if for_G:
        for_real = True
    target = alpha if for_real else 0.0
    loss = 0.0
    for l in logits:
        l32 = l.astype(jnp.float32)
        # BCEWithLogits: max(l,0) - l*t + log(1+exp(-|l|))
        per = jnp.maximum(l32, 0) - l32 * target + jnp.log1p(jnp.exp(-jnp.abs(l32)))
        loss = loss + per.mean(axis=(1, 2))
    return loss.mean()


def discriminator_loss(
    disc_params,
    sn_state,
    strides_meta,
    backbone_params,
    rng,
    x,
    for_real: bool = True,
    for_G: bool = False,
    policy: str = "color,translation,cutout",
    alpha: float = 0.8,
):
    """Full discriminator forward: DiffAugment -> frozen ConvNeXt feats ->
    SN heads -> multi-level BCE. Returns (scalar loss, new_sn_state)."""
    x = diff_augment(rng, x, policy)
    h = normalize_from_pm1(x)
    feats = convnext_features(jax.lax.stop_gradient(backbone_params), h, num_stages=3)
    logits = []
    new_state = {"decoders": {}}
    for li in sorted(disc_params["decoders"], key=int):
        strides = strides_meta[li]
        lg, ns = _head_apply(
            disc_params["decoders"][li], sn_state["decoders"][li], strides, feats[int(li)]
        )
        logits.append(lg)
        new_state["decoders"][li] = ns
    return _multi_level_bce(logits, for_real, for_G, alpha), new_state


def disc_param_labels(params):
    """optax label tree: everything trainable."""
    return jax.tree.map(lambda _: "train", params)
