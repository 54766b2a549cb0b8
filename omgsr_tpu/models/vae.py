"""AutoencoderKL: config-driven KL VAE covering SD2.1 (4-ch latent, scaling
0.18215) and FLUX (16-ch latent, scaling+shift, no quant convs).

Re-implements the capability the reference pulls from diffusers'
AutoencoderKL (train/train_omgsr_s.py:215, train/train_omgsr_f.py:265,
infer/omgsr_f_infer_model.py:17). Param-tree key paths mirror the HF
safetensors layout (encoder.down_blocks.0.resnets.0.conv1 ...) so the weight
porter is a near-identity key map + OIHW->HWIO transpose.

All tensors NHWC. GroupNorm eps is 1e-6 throughout the VAE (diffusers
default for AutoencoderKL blocks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omgsr_tpu.models.configs import VAEConfig
from omgsr_tpu.models.layers import (
    conv2d,
    dense,
    group_norm,
    group_norm_silu,
    init_conv,
    init_dense,
    init_norm,
    nearest_upsample_2x,
    silu,
    upsample_conv_2x,
)
from omgsr_tpu.ops.attention import dot_product_attention

_EPS = 1e-6

# Trace-time GroupNorm interception hook for the tiled/streaming VAE
# (inference/tiled_vae.py): when set, every GroupNorm in the VAE calls
# _GN_HOOK(params, x, groups) instead of computing local statistics. The
# hook either records full-image statistics (collect pass) or applies
# externally supplied global statistics (per-tile apply pass) — the same
# split vaehook.py achieves with its task-queue pauses
# (infer/vaehook.py:459-534).
_GN_HOOK = None


def _vae_group_norm(p, x, groups):
    if _GN_HOOK is not None:
        return _GN_HOOK(p, x, groups)
    return group_norm(p, x, groups, _EPS)


def _vae_group_norm_silu(p, x, groups):
    """Fused GroupNorm+SiLU when no stat hook is installed."""
    if _GN_HOOK is not None:
        return silu(_GN_HOOK(p, x, groups))
    return group_norm_silu(p, x, groups, _EPS)


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------


def _init_resnet(key, in_ch, out_ch, groups, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init_norm(in_ch, dtype),
        "conv1": init_conv(ks[0], 3, 3, in_ch, out_ch, dtype=dtype),
        "norm2": init_norm(out_ch, dtype),
        "conv2": init_conv(ks[1], 3, 3, out_ch, out_ch, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv(ks[2], 1, 1, in_ch, out_ch, dtype=dtype)
    return p


def _init_attn(key, ch, dtype):
    ks = jax.random.split(key, 4)
    return {
        "group_norm": init_norm(ch, dtype),
        "to_q": init_dense(ks[0], ch, ch, dtype=dtype),
        "to_k": init_dense(ks[1], ch, ch, dtype=dtype),
        "to_v": init_dense(ks[2], ch, ch, dtype=dtype),
        "to_out": {"0": init_dense(ks[3], ch, ch, dtype=dtype)},
    }


def _init_mid(key, ch, groups, with_attention, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "resnets": {
            "0": _init_resnet(ks[0], ch, ch, groups, dtype),
            "1": _init_resnet(ks[1], ch, ch, groups, dtype),
        }
    }
    if with_attention:
        p["attentions"] = {"0": _init_attn(ks[2], ch, dtype)}
    return p


def init_vae(key, cfg: VAEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    bo = list(cfg.block_out_channels)
    g = cfg.norm_num_groups
    lat = cfg.latent_channels

    # ---- encoder ----
    enc = {"conv_in": init_conv(next(keys), 3, 3, cfg.in_channels, bo[0], dtype=dtype)}
    down = {}
    ch = bo[0]
    for i, out_ch in enumerate(bo):
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block):
            blk["resnets"][str(j)] = _init_resnet(next(keys), ch if j == 0 else out_ch, out_ch, g, dtype)
        ch = out_ch
        if i < len(bo) - 1:
            blk["downsamplers"] = {"0": {"conv": init_conv(next(keys), 3, 3, ch, ch, dtype=dtype)}}
        down[str(i)] = blk
    enc["down_blocks"] = down
    enc["mid_block"] = _init_mid(next(keys), ch, g, cfg.mid_block_attention, dtype)
    enc["conv_norm_out"] = init_norm(ch, dtype)
    enc["conv_out"] = init_conv(next(keys), 3, 3, ch, 2 * lat, dtype=dtype)

    # ---- decoder ----
    rbo = list(reversed(bo))
    dec = {"conv_in": init_conv(next(keys), 3, 3, lat, rbo[0], dtype=dtype)}
    dec["mid_block"] = _init_mid(next(keys), rbo[0], g, cfg.mid_block_attention, dtype)
    up = {}
    ch = rbo[0]
    for i, out_ch in enumerate(rbo):
        blk = {"resnets": {}}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"][str(j)] = _init_resnet(next(keys), ch if j == 0 else out_ch, out_ch, g, dtype)
        ch = out_ch
        if i < len(rbo) - 1:
            blk["upsamplers"] = {"0": {"conv": init_conv(next(keys), 3, 3, ch, ch, dtype=dtype)}}
        up[str(i)] = blk
    dec["up_blocks"] = up
    dec["conv_norm_out"] = init_norm(ch, dtype)
    dec["conv_out"] = init_conv(next(keys), 3, 3, ch, cfg.out_channels, dtype=dtype)

    params = {"encoder": enc, "decoder": dec}
    if cfg.use_quant_conv:
        params["quant_conv"] = init_conv(next(keys), 1, 1, 2 * lat, 2 * lat, dtype=dtype)
    if cfg.use_post_quant_conv:
        params["post_quant_conv"] = init_conv(next(keys), 1, 1, lat, lat, dtype=dtype)
    return params


# ----------------------------------------------------------------------------
# apply
# ----------------------------------------------------------------------------


def _resnet(p, x, groups):
    h = _vae_group_norm_silu(p["norm1"], x, groups)
    h = conv2d(p["conv1"], h, padding=1)
    h = _vae_group_norm_silu(p["norm2"], h, groups)
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _mid_attention(p, x, groups):
    b, hh, ww, c = x.shape
    h = _vae_group_norm(p["group_norm"], x, groups)
    h = h.reshape(b, hh * ww, c)
    # single-head attention over spatial tokens (diffusers VAE mid block)
    q = dense(p["to_q"], h)[:, :, None, :]
    k = dense(p["to_k"], h)[:, :, None, :]
    v = dense(p["to_v"], h)[:, :, None, :]
    o = dot_product_attention(q, k, v)[:, :, 0, :]
    o = dense(p["to_out"]["0"], o)
    return x + o.reshape(b, hh, ww, c)


def _mid_block(p, x, groups, res=_resnet):
    x = res(p["resnets"]["0"], x, groups)
    if "attentions" in p:
        x = _mid_attention(p["attentions"]["0"], x, groups)
    x = res(p["resnets"]["1"], x, groups)
    return x


def _select_resnet(cfg):
    """Resnet executor for the given config: per-block remat (training),
    fused Pallas kernel (TPU inference; per-shape eligibility with XLA
    fallback), or the plain XLA block. Streaming-VAE hooks force plain."""
    if cfg.remat_blocks:
        return jax.checkpoint(_resnet, static_argnums=(2,))
    if cfg.fused_resblocks and _GN_HOOK is None:
        from omgsr_tpu.ops.conv3x3 import fused_resblock, fused_resblock_eligible

        def res(p, x, groups):
            if fused_resblock_eligible(p, x, groups):
                return fused_resblock(p, x, groups)
            return _resnet(p, x, groups)

        return res
    return _resnet


def vae_encode_features(params, cfg: VAEConfig, x):
    """pixels (B,H,W,3) in [-1,1] -> moments (B,h,w,2*latent)."""
    p = params["encoder"]
    g = cfg.norm_num_groups
    h = conv2d(p["conv_in"], x, padding=1)
    res = _select_resnet(cfg)
    n = len(cfg.block_out_channels)
    for i in range(n):
        blk = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = res(blk["resnets"][str(j)], h, g)
        if "downsamplers" in blk:
            h = downsample_conv_2x(blk["downsamplers"]["0"]["conv"], h)
    h = _mid_block(p["mid_block"], h, g, res=res)
    h = _vae_group_norm_silu(p["conv_norm_out"], h, g)
    h = conv2d(p["conv_out"], h, padding=1)
    if "quant_conv" in params:
        h = conv2d(params["quant_conv"], h, padding=0)
    return h


def scale_latent(cfg: VAEConfig, z):
    """Raw VAE sample -> scaled latent. SD: z*s; FLUX: (z-shift)*s. The ONE
    definition (shared with the exact tiled mode, inference/tiled_vae.py)."""
    if cfg.shift_factor is not None:
        return (z - cfg.shift_factor) * cfg.scaling_factor
    return z * cfg.scaling_factor


def unscale_latent(cfg: VAEConfig, z):
    """Scaled latent -> raw decoder input (inverse of scale_latent)."""
    if cfg.shift_factor is not None:
        return z / cfg.scaling_factor + cfg.shift_factor
    return z / cfg.scaling_factor


def downsample_conv_2x(p, h):
    """diffusers Downsample2D: asymmetric pad (0,1) then stride-2 VALID conv."""
    h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return conv2d(p, h, stride=2, padding="VALID")


def sample_diagonal_gaussian(moments, rng, sample: bool = True):
    """moments (..., 2C) -> latent sample (..., C); logvar clamped [-30, 20]
    (diffusers DiagonalGaussianDistribution semantics)."""
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if not sample:
        return mean
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(rng, mean.shape, mean.dtype)


def vae_encode(params, cfg: VAEConfig, x, rng=None, sample: bool = True):
    """pixels -> scaled latent, applying scaling (and FLUX shift) factors.

    SD:   z = sample * scaling_factor           (train/train_omgsr_s.py:55-58)
    FLUX: z = (sample - shift) * scaling_factor (train/train_omgsr_f.py:68-71)
    """
    moments = vae_encode_features(params, cfg, x)
    z = sample_diagonal_gaussian(moments, rng, sample=sample and rng is not None)
    return scale_latent(cfg, z)


def vae_decode(params, cfg: VAEConfig, z, unscale: bool = True):
    """scaled latent -> pixels in [-1,1] (un-clamped; callers clamp,
    matching train/train_omgsr_s.py:435)."""
    if unscale:
        z = unscale_latent(cfg, z)
    if "post_quant_conv" in params:
        z = conv2d(params["post_quant_conv"], z, padding=0)
    p = params["decoder"]
    g = cfg.norm_num_groups
    h = conv2d(p["conv_in"], z, padding=1)
    res = _select_resnet(cfg)
    h = _mid_block(p["mid_block"], h, g, res=res)
    n = len(cfg.block_out_channels)
    for i in range(n):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = res(blk["resnets"][str(j)], h, g)
        if "upsamplers" in blk:
            # phase-decomposed fused upsample+conv (layers.upsample_conv_2x):
            # identical output, 2.25x fewer FLOPs, no 2x tensor materialized
            h = upsample_conv_2x(blk["upsamplers"]["0"]["conv"], h)
    h = _vae_group_norm_silu(p["conv_norm_out"], h, g)
    h = conv2d(p["conv_out"], h, padding=1)
    return h
