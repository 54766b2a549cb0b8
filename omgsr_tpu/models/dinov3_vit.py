"""DINOv3 Vision Transformer (RoPE, registers, LayerScale) — TPU-native.

Re-owns the vendored backbone family the reference ships but keeps off
OMGSR's execution path (dinov3/models/vision_transformer.py:55-412 and
dinov3/layers/{attention,block,rope_position_encoding,patch_embed,
ffn_layers,layer_scale}.py; built by dinov3/hub/backbones.py:63-146).
OMGSR itself only loads the ConvNeXt (models/convnext.py here); the ViTs
are the other hub exports and drop in as alternative DISTS/discriminator
feature backbones via `vit_features`.

Architecture (eval path — the train-only RoPE coordinate augmentations
shift/jitter/rescale and stochastic depth are sampling noise, not weights):
  patch conv P x P /P -> tokens [cls, storage*, patches]
  per block: x += ls1 * attn(LN(x))   (RoPE on patch q/k, axial sin/cos)
             x += ls2 * ffn(LN(x))    (mlp or swiglu)
  final LN (optionally untied for cls/registers vs patches)

Param paths mirror the torch state dict (blocks.0.attn.qkv.kernel, ...) so
the hub .pth porter is mechanical. The reference's LinearKMaskedBias
(attention.py:30-40) multiplies the k-third of the qkv bias by a stored
mask; the porter folds that product into the bias, so apply-side code sees
a plain dense. All attention goes through ops.attention (auto flash
dispatch); norms/matmuls accumulate in f32 like the rest of the model zoo.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.configs import VIT_SIZES, DinoV3ViTConfig
from omgsr_tpu.models.layers import (
    dense,
    gelu,
    init_conv,
    init_dense,
    init_norm,
    layer_norm,
)
from omgsr_tpu.ops.attention import dot_product_attention

__all__ = [
    "DinoV3ViTConfig",
    "VIT_SIZES",
    "init_dinov3_vit",
    "dinov3_vit_apply",
    "get_intermediate_layers",
    "vit_features",
    "rope_sincos",
]


def rope_periods(cfg: DinoV3ViTConfig) -> np.ndarray:
    """base**(2i/(D_head/2)), i < D_head/4 (rope_position_encoding.py:110-113)."""
    q = cfg.head_dim // 4
    return cfg.rope_base ** (2.0 * np.arange(q, dtype=np.float64) / (cfg.head_dim // 2))


def _init_block(key, cfg: DinoV3ViTConfig, dtype):
    d = cfg.embed_dim
    ks = jax.random.split(key, 4)
    p = {
        "norm1": init_norm(d, dtype),
        "attn": {
            "qkv": init_dense(ks[0], d, 3 * d, use_bias=cfg.qkv_bias, dtype=dtype),
            "proj": init_dense(ks[1], d, d, dtype=dtype),
        },
        "ls1": {"gamma": jnp.full((d,), cfg.layerscale_init, dtype)},
        "norm2": init_norm(d, dtype),
        "ls2": {"gamma": jnp.full((d,), cfg.layerscale_init, dtype)},
    }
    if cfg.ffn_layer == "mlp":
        hidden = int(d * cfg.ffn_ratio)
        p["mlp"] = {
            "fc1": init_dense(ks[2], d, hidden, dtype=dtype),
            "fc2": init_dense(ks[3], hidden, d, dtype=dtype),
        }
    else:
        hidden = cfg.swiglu_hidden
        kk = jax.random.split(ks[2], 3)
        p["mlp"] = {
            "w1": init_dense(kk[0], d, hidden, dtype=dtype),
            "w2": init_dense(kk[1], d, hidden, dtype=dtype),
            "w3": init_dense(kk[2], hidden, d, dtype=dtype),
        }
    return p


def init_dinov3_vit(key, cfg: DinoV3ViTConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.depth + 4)
    d = cfg.embed_dim
    params = {
        "cls_token": jax.random.normal(keys[0], (1, 1, d), dtype) * 0.02,
        "mask_token": jnp.zeros((1, d), dtype),
        "patch_embed": {
            "proj": init_conv(
                keys[1], cfg.patch_size, cfg.patch_size, cfg.in_chans, d, dtype=dtype
            )
        },
        "rope_embed": {"periods": jnp.asarray(rope_periods(cfg), jnp.float32)},
        "blocks": {
            str(i): _init_block(keys[4 + i], cfg, dtype) for i in range(cfg.depth)
        },
        "norm": init_norm(d, dtype),
    }
    if cfg.n_storage_tokens > 0:
        params["storage_tokens"] = (
            jax.random.normal(keys[2], (1, cfg.n_storage_tokens, d), dtype) * 0.02
        )
    if cfg.untie_cls_and_patch_norms:
        params["cls_norm"] = init_norm(d, dtype)
    return params


def rope_sincos(params, cfg: DinoV3ViTConfig, h: int, w: int):
    """Axial RoPE tables for an h x w patch grid -> (sin, cos), each (h*w, D_head).

    rope_position_encoding.py:57-107, eval path: coords at pixel centers
    normalized to [-1, 1], angles 2*pi*coord/period per axis, halves tiled so
    feature i pairs with i + D_head/2.
    """
    periods = params["rope_embed"]["periods"].astype(jnp.float32)
    if cfg.rope_normalize_coords == "separate":
        ch = (jnp.arange(0.5, h, dtype=jnp.float32) / h) * 2.0 - 1.0
        cw = (jnp.arange(0.5, w, dtype=jnp.float32) / w) * 2.0 - 1.0
    else:
        denom = min(h, w) if cfg.rope_normalize_coords == "min" else max(h, w)
        ch = (jnp.arange(0.5, h, dtype=jnp.float32) / denom) * 2.0 - 1.0
        cw = (jnp.arange(0.5, w, dtype=jnp.float32) / denom) * 2.0 - 1.0
    coords = jnp.stack(jnp.meshgrid(ch, cw, indexing="ij"), axis=-1).reshape(-1, 2)
    angles = 2.0 * jnp.pi * coords[:, :, None] / periods[None, None, :]
    angles = angles.reshape(angles.shape[0], -1)  # (hw, D_head/2): [h..., w...]
    angles = jnp.tile(angles, (1, 2))  # (hw, D_head)
    return jnp.sin(angles), jnp.cos(angles)


def _rope_apply(x, sin, cos):
    # attention.py:16-27: rotate_half([x1, x2]) = [-x2, x1]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin


def _attention(p, x, sincos, n_prefix: int, cfg: DinoV3ViTConfig):
    b, n, d = x.shape
    qkv = dense(p["qkv"], x).reshape(b, n, 3, cfg.num_heads, cfg.head_dim)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, Dh)
    if sincos is not None:
        sin, cos = sincos  # (hw, Dh) f32; rope math runs in f32 (attention.py:68-87)
        sin = sin[None, :, None, :]
        cos = cos[None, :, None, :]
        qp = _rope_apply(q[:, n_prefix:].astype(jnp.float32), sin, cos)
        kp = _rope_apply(k[:, n_prefix:].astype(jnp.float32), sin, cos)
        q = jnp.concatenate([q[:, :n_prefix], qp.astype(q.dtype)], axis=1)
        k = jnp.concatenate([k[:, :n_prefix], kp.astype(k.dtype)], axis=1)
    out = dot_product_attention(q, k, v)
    return dense(p["proj"], out.reshape(b, n, d))


def _ffn(p, x, cfg: DinoV3ViTConfig):
    if cfg.ffn_layer == "mlp":
        return dense(p["fc2"], gelu(dense(p["fc1"], x), approximate=False))
    return dense(p["w3"], jax.nn.silu(dense(p["w1"], x)) * dense(p["w2"], x))


def _block(p, x, sincos, n_prefix, cfg):
    h = _attention(p["attn"], layer_norm(p["norm1"], x, cfg.norm_eps), sincos, n_prefix, cfg)
    x = x + p["ls1"]["gamma"].astype(x.dtype) * h
    h = _ffn(p["mlp"], layer_norm(p["norm2"], x, cfg.norm_eps), cfg)
    return x + p["ls2"]["gamma"].astype(x.dtype) * h


def _prepare_tokens(params, cfg: DinoV3ViTConfig, x, masks=None):
    """NHWC image -> ([cls, storage, patch] tokens, (h, w) patch grid).

    vision_transformer.py:186-216. `masks` (B, hw) bool swaps masked patch
    embeddings for the shared mask token (the iBOT input path).
    """
    from omgsr_tpu.models.layers import conv2d

    b = x.shape[0]
    x = conv2d(params["patch_embed"]["proj"], x, stride=cfg.patch_size, padding="VALID")
    h, w = x.shape[1], x.shape[2]
    x = x.reshape(b, h * w, cfg.embed_dim)
    if masks is not None:
        x = jnp.where(
            masks[:, :, None], params["mask_token"][None].astype(x.dtype), x
        )
    toks = [jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.embed_dim))]
    if cfg.n_storage_tokens > 0:
        toks.append(
            jnp.broadcast_to(
                params["storage_tokens"].astype(x.dtype),
                (b, cfg.n_storage_tokens, cfg.embed_dim),
            )
        )
    return jnp.concatenate(toks + [x], axis=1), (h, w)


def dinov3_vit_apply(params, cfg: DinoV3ViTConfig, x, masks=None):
    """NHWC image (ImageNet-normalized) -> feature dict, keys as upstream
    forward_features (vision_transformer.py:244-256): x_norm_clstoken,
    x_storage_tokens, x_norm_patchtokens (B, hw, D), x_prenorm."""
    x, (h, w) = _prepare_tokens(params, cfg, x, masks)
    n_prefix = 1 + cfg.n_storage_tokens
    sincos = rope_sincos(params, cfg, h, w)
    block = _block
    if cfg.remat_blocks:
        block = jax.checkpoint(_block, static_argnums=(3, 4))
    for i in range(cfg.depth):
        x = block(params["blocks"][str(i)], x, sincos, n_prefix, cfg)
    if cfg.untie_cls_and_patch_norms:
        cls_reg = layer_norm(params["cls_norm"], x[:, :n_prefix], cfg.norm_eps)
        patch = layer_norm(params["norm"], x[:, n_prefix:], cfg.norm_eps)
    else:
        normed = layer_norm(params["norm"], x, cfg.norm_eps)
        cls_reg, patch = normed[:, :n_prefix], normed[:, n_prefix:]
    return {
        "x_norm_clstoken": cls_reg[:, 0],
        "x_storage_tokens": cls_reg[:, 1:],
        "x_norm_patchtokens": patch,
        "x_prenorm": x,
    }


def get_intermediate_layers(
    params,
    cfg: DinoV3ViTConfig,
    x,
    n: int | Sequence[int] = 1,
    reshape: bool = False,
    norm: bool = True,
    return_class_token: bool = False,
    return_extra_tokens: bool = False,
):
    """Patch-token maps from the last n (or listed) blocks
    (vision_transformer.py:265-318). reshape=True returns NHWC maps at
    stride patch_size — the ViT analogue of convnext_features.
    return_class_token=True yields (patch, cls) pairs per block — the
    layout the linear-probe evaluator consumes (eval/linear.py:148-160).
    return_extra_tokens=True appends the storage/register tokens
    (B, R, D) to each tuple — the dinotxt vision tower's input layout
    (eval/text/vision_tower.py:127-137)."""
    tokens, (h, w) = _prepare_tokens(params, cfg, x)
    n_prefix = 1 + cfg.n_storage_tokens
    sincos = rope_sincos(params, cfg, h, w)
    take = (
        set(range(cfg.depth - n, cfg.depth)) if isinstance(n, int) else set(n)
    )
    outs = []
    for i in range(cfg.depth):
        tokens = _block(params["blocks"][str(i)], tokens, sincos, n_prefix, cfg)
        if i in take:
            outs.append(tokens)
    if norm:
        if cfg.untie_cls_and_patch_norms:
            outs = [
                jnp.concatenate(
                    [
                        layer_norm(params["cls_norm"], o[:, :n_prefix], cfg.norm_eps),
                        layer_norm(params["norm"], o[:, n_prefix:], cfg.norm_eps),
                    ],
                    axis=1,
                )
                for o in outs
            ]
        else:
            outs = [layer_norm(params["norm"], o, cfg.norm_eps) for o in outs]
    patches = [o[:, n_prefix:] for o in outs]
    if reshape:
        b = x.shape[0]
        patches = [p.reshape(b, h, w, cfg.embed_dim) for p in patches]
    if return_class_token and return_extra_tokens:
        return [(p, o[:, 0], o[:, 1:n_prefix]) for p, o in zip(patches, outs)]
    if return_class_token:
        return [(p, o[:, 0]) for p, o in zip(patches, outs)]
    if return_extra_tokens:
        return [(p, o[:, 1:n_prefix]) for p, o in zip(patches, outs)]
    return patches


def vit_features(params, cfg: DinoV3ViTConfig, x, layers: Sequence[int] | int = 4):
    """ImageNet-normalized NHWC image -> list of NHWC feature maps from
    evenly spaced (or listed) blocks — a drop-in alternative to
    convnext_features for DISTS/discriminator heads (single stride:
    patch_size)."""
    if isinstance(layers, int):
        step = cfg.depth / layers
        layers = [int(step * (i + 1)) - 1 for i in range(layers)]
    return get_intermediate_layers(params, cfg, x, n=list(layers), reshape=True)
