"""Mask2Former semantic segmentation suite (ViT-Adapter backbone + pixel
decoder + masked transformer decoder), TPU-native.

Re-owns dinov3/eval/segmentation — models/backbone/dinov3_adapter.py
(DINOv3_Adapter:305-484, SpatialPriorModule:234-302, Extractor:112-156,
ConvFFN/DWConv:73-109, deform_inputs:40-70), models/heads/pixel_decoder.py
(MSDeformAttnPixelDecoder:239-413 incl. its OSS quirks), models/heads/
mask2former_transformer_decoder.py (MultiScaleMaskedTransformerDecoder
:271-471, Self/Cross/FFN layers), models/utils/{position_encoding,
ms_deform_attn,batch_norm}.py, models/__init__.py build_segmentation_decoder
:42-82, and inference.py (make_inference/slide_inference) — as pure
functions over param dicts whose key paths mirror the torch state dicts
(`port_m2f_state`).

TPU-first choices:
- The deformable-attention core is ops.ms_deform_attn (the repo's jittable
  JAX op that replaces the reference's CUDA extension; the C ABI kernel in
  native/msda.cpp is its CPU counterpart).
- torch bilinear resizes ride eval.depth.bilinear_resize (dense MXU
  matmuls, exact interpolation weights); ConvTranspose2d(k=s) is the same
  einsum + depth-to-space trick.
- Everything static-shape: the attn-mask "fully-masked row -> allow all"
  reset is a vectorized mask op, the 9 decoder layers cycle 3 scales as a
  Python loop unrolled at trace time, the sliding-window inference reuses
  ONE compiled predict graph for every crop (all crops share a shape).
- BatchNorms (SyncBatchNorm upstream) run in inference mode from running
  stats — this suite ships heads for EVAL (the reference dir has no
  training loop either); fine-tuning them on TPU would thread batch stats
  like losses/discriminator.py does for spectral norm.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.eval.depth import _conv_transpose_kxk, bilinear_resize
from omgsr_tpu.models.layers import conv2d, dense, group_norm, init_dense, init_norm, layer_norm
from omgsr_tpu.ops.ms_deform_attn import ms_deform_attn

__all__ = [
    "AdapterConfig",
    "M2FConfig",
    "BACKBONE_INTERMEDIATE_LAYERS",
    "init_msda",
    "msda_apply",
    "position_embedding_sine",
    "init_adapter",
    "adapter_apply",
    "init_mask2former_head",
    "mask2former_head_apply",
    "make_segmentor",
    "semantic_inference",
    "slide_inference",
    "port_m2f_state",
]

# models/__init__.py:14-19
BACKBONE_INTERMEDIATE_LAYERS = {
    "dinov3_vits16": [2, 5, 8, 11],
    "dinov3_vitb16": [2, 5, 8, 11],
    "dinov3_vitl16": [4, 11, 17, 23],
    "dinov3_vit7b16": [9, 19, 29, 39],
}


@dataclasses.dataclass(frozen=True)
class AdapterConfig:
    """DINOv3_Adapter args (dinov3_adapter.py:306-322)."""

    interaction_indexes: Sequence[int] = (4, 11, 17, 23)
    conv_inplane: int = 64
    n_points: int = 4
    deform_num_heads: int = 16
    cffn_ratio: float = 0.25
    deform_ratio: float = 0.5
    add_vit_feature: bool = True
    use_extra_extractor: bool = True


@dataclasses.dataclass(frozen=True)
class M2FConfig:
    """Mask2FormerHead args (mask2former_head.py:17-73)."""

    hidden_dim: int = 2048
    num_classes: int = 150
    num_queries: int = 100
    nheads: int = 16
    dim_feedforward: int = 4096
    enc_layers: int = 6
    dec_layers: int = 9
    enc_points: int = 4
    num_feature_levels: int = 3


# ---------------------------------------------------------------------------
# small primitives
# ---------------------------------------------------------------------------


def _batch_norm_eval(p, x, eps=1e-5):
    """SyncBatchNorm in eval mode: running stats (NHWC channels-last)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    return (
        (x.astype(jnp.float32) - p["mean"].astype(jnp.float32))
        * inv
        * p["scale"].astype(jnp.float32)
        + p["bias"].astype(jnp.float32)
    ).astype(x.dtype)


def _init_bn(dim, dtype=jnp.float32):
    return {
        "scale": jnp.ones((dim,), dtype),
        "bias": jnp.zeros((dim,), dtype),
        "mean": jnp.zeros((dim,), dtype),
        "var": jnp.ones((dim,), dtype),
    }


def _init_conv(key, kh, kw, cin, cout, bias=True, groups=1, dtype=jnp.float32):
    fan = kh * kw * cin // groups
    w = jax.random.normal(key, (kh, kw, cin // groups, cout), dtype) * math.sqrt(2.0 / fan)
    p = {"kernel": w}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _maxpool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )


_SINE_CACHE: dict = {}


def position_embedding_sine(h, w, num_pos_feats, temperature=10000.0, scale=2 * math.pi):
    """PositionEmbeddingSine with no padding mask (position_encoding.py
    :35-54): (h*w, 2*num_pos_feats) numpy, [pos_y | pos_x] channel order,
    per-pair (sin, cos) interleave. Cached as numpy."""
    key = (h, w, num_pos_feats)
    out = _SINE_CACHE.get(key)
    if out is not None:
        return out
    eps = 1e-6
    y = (np.arange(h, dtype=np.float64) + 1.0) / (h + eps) * scale
    x = (np.arange(w, dtype=np.float64) + 1.0) / (w + eps) * scale
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2) / num_pos_feats)

    def enc(v):  # (n,) -> (n, num_pos_feats) interleaved sin/cos
        p = v[:, None] / dim_t
        return np.stack([np.sin(p[:, 0::2]), np.cos(p[:, 1::2])], -1).reshape(len(v), -1)

    pos_y = np.repeat(enc(y), w, axis=0)  # (h*w, N)
    pos_x = np.tile(enc(x), (h, 1))
    out = np.concatenate([pos_y, pos_x], -1).astype(np.float32)
    _SINE_CACHE[key] = out
    return out


# ---------------------------------------------------------------------------
# MSDeformAttn module (utils/ms_deform_attn.py:102-214)
# ---------------------------------------------------------------------------


def init_msda(key, d_model, n_levels, n_heads, n_points, ratio=1.0, dtype=jnp.float32):
    """Key paths mirror the torch module; sampling_offsets gets the exact
    per-head compass-rose bias init (:134-146)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    thetas = np.arange(n_heads, dtype=np.float64) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    d_val = int(d_model * ratio)
    return {
        "sampling_offsets": {
            "kernel": jnp.zeros((d_model, n_heads * n_levels * n_points * 2), dtype),
            "bias": jnp.asarray(grid.reshape(-1), dtype),
        },
        "attention_weights": {
            "kernel": jnp.zeros((d_model, n_heads * n_levels * n_points), dtype),
            "bias": jnp.zeros((n_heads * n_levels * n_points,), dtype),
        },
        "value_proj": init_dense(k3, d_model, d_val, dtype=dtype),
        "output_proj": init_dense(k4, d_val, d_model, dtype=dtype),
    }


def msda_apply(p, query, reference_points, feat, spatial_shapes, *, n_heads, n_points, ratio=1.0):
    """MSDeformAttn.forward (:155-213). reference_points (B, Q, L, 2) in
    [0,1]; spatial_shapes a static list of (Hl, Wl)."""
    b, q, d_model = query.shape
    L = len(spatial_shapes)
    value = dense(p["value_proj"], feat)
    d_val = value.shape[-1]
    value = value.reshape(b, -1, n_heads, d_val // n_heads)
    offsets = dense(p["sampling_offsets"], query).reshape(b, q, n_heads, L, n_points, 2)
    weights = dense(p["attention_weights"], query).reshape(b, q, n_heads, L * n_points)
    weights = jax.nn.softmax(weights, axis=-1).reshape(b, q, n_heads, L, n_points)
    normalizer = jnp.asarray([(wl, hl) for hl, wl in spatial_shapes], jnp.float32)
    locations = (
        reference_points[:, :, None, :, None, :]
        + offsets / normalizer[None, None, None, :, None, :]
    )
    out = ms_deform_attn(value, spatial_shapes, locations, weights)
    return dense(p["output_proj"], out)


def _reference_points(spatial_shapes) -> np.ndarray:
    """get_reference_points (dinov3_adapter.py:40-53): center-of-pixel
    normalized coords over the listed grids, concatenated. (sum HW, 2)."""
    refs = []
    for hl, wl in spatial_shapes:
        ry = (np.arange(hl, dtype=np.float64) + 0.5) / hl
        rx = (np.arange(wl, dtype=np.float64) + 0.5) / wl
        g = np.stack(np.meshgrid(rx, ry, indexing="xy"), -1).reshape(-1, 2)
        refs.append(g)
    return np.concatenate(refs, 0).astype(np.float32)


# ---------------------------------------------------------------------------
# ViT-Adapter backbone (dinov3_adapter.py)
# ---------------------------------------------------------------------------


def _init_extractor(key, dim, acfg: AdapterConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    hidden = int(dim * acfg.cffn_ratio)
    return {
        "query_norm": init_norm(dim, dtype),
        "feat_norm": init_norm(dim, dtype),
        "attn": init_msda(
            ks[0], dim, 1, acfg.deform_num_heads, acfg.n_points, acfg.deform_ratio, dtype
        ),
        "ffn": {
            "fc1": init_dense(ks[1], dim, hidden, dtype=dtype),
            "dwconv": {"dwconv": _init_conv(ks[2], 3, 3, hidden, hidden, True, hidden, dtype)},
            "fc2": init_dense(ks[3], hidden, dim, dtype=dtype),
        },
        "ffn_norm": init_norm(dim, dtype),
    }


def _dwconv_apply(p, x, h, w):
    """DWConv (dinov3_adapter.py:94-109): the 21n token split over the
    8/16/32-stride grids, depthwise 3x3 on each, re-concat."""
    b, n, c = x.shape
    n1 = (2 * h) * (2 * w)
    n2 = h * w
    x1 = x[:, :n1].reshape(b, 2 * h, 2 * w, c)
    x2 = x[:, n1 : n1 + n2].reshape(b, h, w, c)
    x3 = x[:, n1 + n2 :].reshape(b, h // 2, w // 2, c)
    outs = [
        conv2d(p["dwconv"], xi, padding=1, groups=c).reshape(b, -1, c)
        for xi in (x1, x2, x3)
    ]
    return jnp.concatenate(outs, axis=1)


def _extractor_apply(p, acfg, query, reference_points, feat, spatial_shapes, h, w):
    """Extractor.forward (dinov3_adapter.py:140-156), eval (no drop-path)."""
    attn = msda_apply(
        p["attn"],
        layer_norm(p["query_norm"], query, 1e-6),
        reference_points,
        layer_norm(p["feat_norm"], feat, 1e-6),
        spatial_shapes,
        n_heads=acfg.deform_num_heads,
        n_points=acfg.n_points,
        ratio=acfg.deform_ratio,
    )
    query = query + attn
    ffn = p["ffn"]
    hdn = dense(ffn["fc1"], layer_norm(p["ffn_norm"], query, 1e-6))
    hdn = jax.nn.gelu(_dwconv_apply(ffn["dwconv"], hdn, h, w), approximate=False)
    return query + dense(ffn["fc2"], hdn)


def _init_spm_block(key, cin, cout, dtype):
    return {"0": _init_conv(key, 3, 3, cin, cout, False, 1, dtype), "1": _init_bn(cout, dtype)}


def init_adapter(key, vit_cfg, acfg: AdapterConfig, dtype=jnp.float32):
    dim = vit_cfg.embed_dim
    inp = acfg.conv_inplane
    ks = iter(jax.random.split(key, 32))
    spm = {
        "stem": {
            "0": _init_conv(next(ks), 3, 3, 3, inp, False, 1, dtype),
            "1": _init_bn(inp, dtype),
            "3": _init_conv(next(ks), 3, 3, inp, inp, False, 1, dtype),
            "4": _init_bn(inp, dtype),
            "6": _init_conv(next(ks), 3, 3, inp, inp, False, 1, dtype),
            "7": _init_bn(inp, dtype),
        },
        "conv2": _init_spm_block(next(ks), inp, 2 * inp, dtype),
        "conv3": _init_spm_block(next(ks), 2 * inp, 4 * inp, dtype),
        "conv4": _init_spm_block(next(ks), 4 * inp, 4 * inp, dtype),
        "fc1": _init_conv(next(ks), 1, 1, inp, dim, True, 1, dtype),
        "fc2": _init_conv(next(ks), 1, 1, 2 * inp, dim, True, 1, dtype),
        "fc3": _init_conv(next(ks), 1, 1, 4 * inp, dim, True, 1, dtype),
        "fc4": _init_conv(next(ks), 1, 1, 4 * inp, dim, True, 1, dtype),
    }
    n_inter = len(acfg.interaction_indexes)
    interactions = {}
    for i in range(n_inter):
        blk = {"extractor": _init_extractor(next(ks), dim, acfg, dtype)}
        if acfg.use_extra_extractor and i == n_inter - 1:
            blk["extra_extractors"] = {
                "0": _init_extractor(next(ks), dim, acfg, dtype),
                "1": _init_extractor(next(ks), dim, acfg, dtype),
            }
        interactions[str(i)] = blk
    return {
        "level_embed": jax.random.normal(next(ks), (3, dim), dtype),
        "spm": spm,
        "interactions": interactions,
        # ConvTranspose(2, 2) kernel in the torch (C_in, C_out, k, k) layout
        "up": {
            "kernel": jax.random.normal(next(ks), (dim, dim, 2, 2), dtype)
            * math.sqrt(2.0 / (4 * dim)),
            "bias": jnp.zeros((dim,), dtype),
        },
        "norm1": _init_bn(dim, dtype),
        "norm2": _init_bn(dim, dtype),
        "norm3": _init_bn(dim, dtype),
        "norm4": _init_bn(dim, dtype),
    }


def _spm_apply(p, x):
    """SpatialPriorModule.forward (dinov3_adapter.py:279-302), NHWC."""

    def block(bp, x, stride):
        x = conv2d(bp["0"], x, stride=stride, padding=1)
        return jax.nn.relu(_batch_norm_eval(bp["1"], x))

    s = p["stem"]
    c1 = jax.nn.relu(_batch_norm_eval(s["1"], conv2d(s["0"], x, stride=2, padding=1)))
    c1 = jax.nn.relu(_batch_norm_eval(s["4"], conv2d(s["3"], c1, padding=1)))
    c1 = jax.nn.relu(_batch_norm_eval(s["7"], conv2d(s["6"], c1, padding=1)))
    c1 = _maxpool_3x3_s2(c1)
    c2 = block(p["conv2"], c1, 2)
    c3 = block(p["conv3"], c2, 2)
    c4 = block(p["conv4"], c3, 2)
    c1 = conv2d(p["fc1"], c1, padding="VALID")
    c2 = conv2d(p["fc2"], c2, padding="VALID")
    c3 = conv2d(p["fc3"], c3, padding="VALID")
    c4 = conv2d(p["fc4"], c4, padding="VALID")
    return c1, c2, c3, c4


def adapter_apply(params, acfg: AdapterConfig, backbone_params, vit_cfg, x):
    """DINOv3_Adapter.forward (dinov3_adapter.py:408-484): frozen-ViT
    intermediate layers + SPM pyramid fused by deformable extractors.
    x: NHWC image (H, W divisible by 32). Returns {"1".."4"} NHWC feature
    maps at strides 4/8/16/32."""
    from omgsr_tpu.models.dinov3_vit import get_intermediate_layers

    b, H, W, _ = x.shape
    ps = vit_cfg.patch_size
    h_c, w_c = H // 16, W // 16
    h_t, w_t = H // ps, W // ps
    c_shapes = [(H // 8, W // 8), (h_c, w_c), (H // 32, W // 32)]
    refs_c = jnp.asarray(_reference_points(c_shapes))[None]  # queries = c tokens
    refs_c = jnp.broadcast_to(refs_c[:, :, None, :], (1, refs_c.shape[1], 1, 2))

    c1, c2m, c3m, c4m = _spm_apply(params["spm"], x)
    dim = c2m.shape[-1]
    lvl = params["level_embed"].astype(c2m.dtype)
    c2 = c2m.reshape(b, -1, dim) + lvl[0]
    c3 = c3m.reshape(b, -1, dim) + lvl[1]
    c4 = c4m.reshape(b, -1, dim) + lvl[2]
    n2, n3 = c2.shape[1], c3.shape[1]
    c = jnp.concatenate([c2, c3, c4], axis=1)

    bb = jax.lax.stop_gradient(backbone_params)
    all_layers = get_intermediate_layers(
        bb, vit_cfg, x, n=list(acfg.interaction_indexes), return_class_token=True
    )

    outs = []
    for i in range(len(acfg.interaction_indexes)):
        feat, _cls = all_layers[i]
        blk = params["interactions"][str(i)]
        c = _extractor_apply(
            blk["extractor"], acfg, c, refs_c, feat, [(h_t, w_t)], h_c, w_c
        )
        if "extra_extractors" in blk:
            for j in ("0", "1"):
                c = _extractor_apply(
                    blk["extra_extractors"][j], acfg, c, refs_c, feat, [(h_t, w_t)], h_c, w_c
                )
        outs.append(feat.reshape(b, h_t, w_t, dim))

    c2 = c[:, :n2].reshape(b, 2 * h_c, 2 * w_c, dim)
    c3 = c[:, n2 : n2 + n3].reshape(b, h_c, w_c, dim)
    c4 = c[:, n2 + n3 :].reshape(b, h_c // 2, w_c // 2, dim)
    c1 = _conv_transpose_kxk(params["up"], c2, 2) + c1

    if acfg.add_vit_feature:
        x1, x2, x3, x4 = outs
        c1 = c1 + bilinear_resize(x1, (4 * h_c, 4 * w_c), False)
        c2 = c2 + bilinear_resize(x2, (2 * h_c, 2 * w_c), False)
        c3 = c3 + bilinear_resize(x3, (h_c, w_c), False)
        c4 = c4 + bilinear_resize(x4, (h_c // 2, w_c // 2), False)

    return {
        "1": _batch_norm_eval(params["norm1"], c1),
        "2": _batch_norm_eval(params["norm2"], c2),
        "3": _batch_norm_eval(params["norm3"], c3),
        "4": _batch_norm_eval(params["norm4"], c4),
    }


# ---------------------------------------------------------------------------
# pixel decoder (pixel_decoder.py:239-413)
# ---------------------------------------------------------------------------


def init_mask2former_head(key, in_channels: int, cfg: M2FConfig, dtype=jnp.float32):
    """Pixel decoder + transformer predictor, torch state-dict key paths
    (mask2former_head.py:47-73 wiring)."""
    d = cfg.hidden_dim
    ks = iter(jax.random.split(key, 64))

    def xavier_dense(k, cin, cout):
        lim = math.sqrt(6.0 / (cin + cout))
        return {
            "kernel": jax.random.uniform(k, (cin, cout), dtype, -lim, lim),
            "bias": jnp.zeros((cout,), dtype),
        }

    enc_layer = lambda k: {
        "self_attn": init_msda(k, d, cfg.num_feature_levels, cfg.nheads, cfg.enc_points, 1.0, dtype),
        "norm1": init_norm(d, dtype),
        "linear1": xavier_dense(jax.random.fold_in(k, 1), d, cfg.dim_feedforward),
        "linear2": xavier_dense(jax.random.fold_in(k, 2), cfg.dim_feedforward, d),
        "norm2": init_norm(d, dtype),
    }
    pixel = {
        "input_convs": {
            str(i): {"0": _init_conv(next(ks), 1, 1, in_channels, d, True, 1, dtype), "1": init_norm(d, dtype)}
            for i in range(cfg.num_feature_levels)
        },
        "encoder": {
            "level_encoding": jax.random.normal(next(ks), (cfg.num_feature_levels, d), dtype),
            "encoder": {
                "layers": {str(i): enc_layer(next(ks)) for i in range(cfg.enc_layers)}
            },
        },
        "mask_feature": _init_conv(next(ks), 1, 1, d, d, True, 1, dtype),
        # detectron2 Conv2d wrapper: weight at the module root, norm nested
        "lateral_convs": {"0": {**_init_conv(next(ks), 1, 1, in_channels, d, False, 1, dtype), "norm": init_norm(d, dtype)}},
        "output_convs": {"0": {**_init_conv(next(ks), 3, 3, d, d, False, 1, dtype), "norm": init_norm(d, dtype)}},
    }

    def attn_layer(k, attn_name):
        return {
            attn_name: {
                "in_proj": xavier_dense(k, d, 3 * d),
                "out_proj": xavier_dense(jax.random.fold_in(k, 1), d, d),
            },
            "norm": init_norm(d, dtype),
        }

    predictor = {
        "transformer_self_attention_layers": {str(i): attn_layer(next(ks), "self_attn") for i in range(cfg.dec_layers)},
        "transformer_cross_attention_layers": {str(i): attn_layer(next(ks), "multihead_attn") for i in range(cfg.dec_layers)},
        "transformer_ffn_layers": {
            str(i): {
                "linear1": xavier_dense(next(ks), d, cfg.dim_feedforward),
                "linear2": xavier_dense(next(ks), cfg.dim_feedforward, d),
                "norm": init_norm(d, dtype),
            }
            for i in range(cfg.dec_layers)
        },
        "post_norm": init_norm(d, dtype),
        "query_feat": {"weight": jax.random.normal(next(ks), (cfg.num_queries, d), dtype)},
        "query_embed": {"weight": jax.random.normal(next(ks), (cfg.num_queries, d), dtype)},
        "level_embed": {"weight": jax.random.normal(next(ks), (cfg.num_feature_levels, d), dtype)},
        "class_embed": init_dense(next(ks), d, cfg.num_classes + 1, dtype=dtype),
        "mask_embed": {
            "layers": {
                "0": init_dense(next(ks), d, d, dtype=dtype),
                "1": init_dense(next(ks), d, d, dtype=dtype),
                "2": init_dense(next(ks), d, d, dtype=dtype),
            }
        },
    }
    return {"pixel_decoder": pixel, "predictor": predictor}


def _pixel_decoder_apply(p, cfg: M2FConfig, features):
    """MSDeformAttnPixelDecoder.forward_features (:370-413), preserving the
    OSS quirks: encoder consumes levels ["4","3","2"] (the [::-1][:-1]
    slice), the FPN adds exactly feature "1" (the in_features[0] string
    iteration bug resolves to that), and multi_scale = encoder outputs."""
    srcs, pos, shapes = [], [], []
    for idx, f in enumerate(["4", "3", "2"]):
        x = features[f].astype(jnp.float32)
        b, h, w, _ = x.shape
        ic = p["input_convs"][str(idx)]
        s = conv2d(ic["0"], x, padding="VALID")
        s = group_norm(ic["1"], s, num_groups=32, eps=1e-5)
        srcs.append(s.reshape(b, h * w, -1))
        pe = jnp.asarray(position_embedding_sine(h, w, s.shape[-1] // 2))
        pos.append(pe[None])
        shapes.append((h, w))

    enc = p["encoder"]
    lvl_pos = [
        pe + enc["level_encoding"][i][None, None].astype(pe.dtype)
        for i, pe in enumerate(pos)
    ]
    src = jnp.concatenate(srcs, axis=1)
    pos_flat = jnp.concatenate(lvl_pos, axis=1)
    refs = jnp.asarray(_reference_points(shapes))[None, :, None, :]
    refs = jnp.broadcast_to(refs, (src.shape[0], refs.shape[1], len(shapes), 2))

    out = src
    for i in range(cfg.enc_layers):
        lp = enc["encoder"]["layers"][str(i)]
        attn = msda_apply(
            lp["self_attn"], out + pos_flat.astype(out.dtype), refs, out, shapes,
            n_heads=cfg.nheads, n_points=cfg.enc_points,
        )
        out = layer_norm(lp["norm1"], out + attn)
        ffn = dense(lp["linear2"], jax.nn.relu(dense(lp["linear1"], out)))
        out = layer_norm(lp["norm2"], out + ffn)

    # split back to maps
    maps = []
    start = 0
    b = out.shape[0]
    for h, w in shapes:
        maps.append(out[:, start : start + h * w].reshape(b, h, w, -1))
        start += h * w

    # FPN level "1"
    lat = p["lateral_convs"]["0"]
    outc = p["output_convs"]["0"]
    x1 = features["1"].astype(jnp.float32)
    cur = conv2d(lat, x1, padding="VALID")
    cur = group_norm(lat["norm"], cur, num_groups=32, eps=1e-5)
    y = cur + bilinear_resize(maps[-1], cur.shape[1:3], False)
    y = conv2d(outc, y, padding=1)
    y = jax.nn.relu(group_norm(outc["norm"], y, num_groups=32, eps=1e-5))

    mask_features = conv2d(p["mask_feature"], y, padding="VALID")
    return mask_features, maps[0], maps  # (stride-4 mask feats, top, 3 scales)


# ---------------------------------------------------------------------------
# transformer decoder (mask2former_transformer_decoder.py:271-471)
# ---------------------------------------------------------------------------


def _mha(p, q_in, k_in, v_in, n_heads, mask=None):
    """nn.MultiheadAttention with a packed in_proj; mask True = disallow
    ((B, H, Q, S) bool)."""
    b, q, d = q_in.shape
    w = p["in_proj"]["kernel"]
    bias = p["in_proj"]["bias"]
    dh = d // n_heads
    qp = (q_in @ w[:, :d] + bias[:d]).reshape(b, q, n_heads, dh)
    kp = (k_in @ w[:, d : 2 * d] + bias[d : 2 * d]).reshape(b, -1, n_heads, dh)
    vp = (v_in @ w[:, 2 * d :] + bias[2 * d :]).reshape(b, -1, n_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp).astype(jnp.float32) / math.sqrt(dh)
    if mask is not None:
        logits = jnp.where(mask, -1e9, logits)
    attn = jax.nn.softmax(logits, axis=-1).astype(q_in.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(b, q, d)
    return dense(p["out_proj"], out)


def _prediction_heads(pred, mask_features, output, target_hw, n_heads):
    """forward_prediction_heads (:444-461)."""
    dec = layer_norm(pred["post_norm"], output)
    out_cls = dense(pred["class_embed"], dec)
    emb = dec
    for i in range(3):
        lyr = pred["mask_embed"]["layers"][str(i)]
        emb = dense(lyr, emb)
        if i < 2:
            emb = jax.nn.relu(emb)
    out_mask = jnp.einsum("bqc,bhwc->bqhw", emb, mask_features)
    resized = bilinear_resize(out_mask.transpose(0, 2, 3, 1), target_hw, False)
    am = jax.nn.sigmoid(resized.transpose(0, 3, 1, 2))  # (B, Q, h, w)
    am = (am.reshape(am.shape[0], 1, am.shape[1], -1) < 0.5)  # (B, 1, Q, hw) bool
    full = jnp.all(am, axis=-1, keepdims=True)  # fully-masked rows allow all (:409)
    am = am & ~full
    am = jnp.repeat(am, n_heads, axis=1)  # (B, H, Q, hw)
    return out_cls, out_mask, jax.lax.stop_gradient(am)


def _m2f_predictor_apply(pred, cfg: M2FConfig, ms_features, mask_features):
    """MultiScaleMaskedTransformerDecoder.forward (:372-442), batch-first."""
    b = mask_features.shape[0]
    srcs, pos, sizes = [], [], []
    for i in range(cfg.num_feature_levels):
        x = ms_features[i]
        _, h, w, _ = x.shape
        sizes.append((h, w))
        pe = jnp.asarray(position_embedding_sine(h, w, x.shape[-1] // 2))
        pos.append(jnp.broadcast_to(pe[None], (b, h * w, x.shape[-1])))
        srcs.append(
            x.reshape(b, h * w, -1) + pred["level_embed"]["weight"][i][None, None].astype(x.dtype)
        )

    query_embed = jnp.broadcast_to(pred["query_embed"]["weight"][None], (b, cfg.num_queries, cfg.hidden_dim))
    output = jnp.broadcast_to(pred["query_feat"]["weight"][None], (b, cfg.num_queries, cfg.hidden_dim))

    out_cls, out_mask, attn_mask = _prediction_heads(
        pred, mask_features, output, sizes[0], cfg.nheads
    )
    for i in range(cfg.dec_layers):
        li = i % cfg.num_feature_levels
        ca = pred["transformer_cross_attention_layers"][str(i)]
        output = layer_norm(
            ca["norm"],
            output
            + _mha(ca["multihead_attn"], output + query_embed, srcs[li] + pos[li].astype(output.dtype), srcs[li], cfg.nheads, attn_mask),
        )
        sa = pred["transformer_self_attention_layers"][str(i)]
        output = layer_norm(
            sa["norm"],
            output + _mha(sa["self_attn"], output + query_embed, output + query_embed, output, cfg.nheads),
        )
        ff = pred["transformer_ffn_layers"][str(i)]
        output = layer_norm(
            ff["norm"],
            output + dense(ff["linear2"], jax.nn.relu(dense(ff["linear1"], output))),
        )
        out_cls, out_mask, attn_mask = _prediction_heads(
            pred, mask_features, output, sizes[(i + 1) % cfg.num_feature_levels], cfg.nheads
        )
    return {"pred_logits": out_cls, "pred_masks": out_mask}


def mask2former_head_apply(params, cfg: M2FConfig, features):
    """Mask2FormerHead.layers (mask2former_head.py:88-96)."""
    mask_features, _, ms = _pixel_decoder_apply(params["pixel_decoder"], cfg, features)
    return _m2f_predictor_apply(params["predictor"], cfg, ms, mask_features)


# ---------------------------------------------------------------------------
# segmentor + inference (models/__init__.py + inference.py)
# ---------------------------------------------------------------------------


def semantic_inference(pred_logits, pred_masks):
    """softmax class probs (drop the void class) x sigmoid masks
    (inference.py:115-119). pred_masks (B, Q, H, W) -> (B, H, W, C)."""
    cls = jax.nn.softmax(pred_logits.astype(jnp.float32), axis=-1)[..., :-1]
    masks = jax.nn.sigmoid(pred_masks.astype(jnp.float32))
    return jnp.einsum("bqc,bqhw->bhwc", cls, masks)


def make_segmentor(adapter_params, head_params, backbone_params, vit_cfg, acfg: AdapterConfig, mcfg: M2FConfig):
    """build_segmentation_decoder (models/__init__.py:42-82): one jittable
    image -> {pred_logits, pred_masks} forward, plus a `predict` that
    resizes the input to 512 and the masks back (FeatureDecoder.predict +
    make_inference "whole" mode)."""

    def forward(x):
        feats = adapter_apply(adapter_params, acfg, backbone_params, vit_cfg, x)
        return mask2former_head_apply(head_params, mcfg, feats)

    def predict(x, rescale_to=(512, 512)):
        x = bilinear_resize(x, (512, 512), False)
        out = forward(x)
        masks = out["pred_masks"].transpose(0, 2, 3, 1)
        masks = bilinear_resize(masks, rescale_to, False).transpose(0, 3, 1, 2)
        return semantic_inference(out["pred_logits"], masks)

    return forward, predict


def slide_inference(predict, image, *, crop_size, stride, n_classes):
    """Sliding-window semantic inference (inference.py:126-181): overlap
    -averaged crops; every crop shares one compiled predict graph. image
    NHWC (B=1); returns (1, H, W, C) numpy."""
    image = np.asarray(image)
    b, h_img, w_img, _ = image.shape
    assert b == 1
    h_crop = w_crop = min(crop_size, h_img, w_img)
    h_grids = max(h_img - h_crop + stride - 1, 0) // stride + 1
    w_grids = max(w_img - w_crop + stride - 1, 0) // stride + 1
    preds = np.zeros((1, h_img, w_img, n_classes), np.float32)
    count = np.zeros((1, h_img, w_img, 1), np.float32)
    for hi in range(h_grids):
        for wi in range(w_grids):
            y2 = min(hi * stride + h_crop, h_img)
            x2 = min(wi * stride + w_crop, w_img)
            y1, x1 = max(y2 - h_crop, 0), max(x2 - w_crop, 0)
            crop = image[:, y1:y2, x1:x2]
            p = np.asarray(predict(crop, rescale_to=(h_crop, w_crop)))
            preds[:, y1:y2, x1:x2] += p
            count[:, y1:y2, x1:x2] += 1.0
    assert (count == 0).sum() == 0
    return preds / count


# ---------------------------------------------------------------------------
# torch checkpoint porter
# ---------------------------------------------------------------------------


def port_m2f_state(state_dict, dtype=jnp.float32):
    """torch state dict (adapter and/or Mask2FormerHead) -> the trees
    above. Linears (O, I) -> (I, O); convs (O, I, kh, kw) -> HWIO
    (depthwise (C, 1, k, k) -> (k, k, 1, C)); ConvTranspose ("up") kept in
    torch layout; BN running stats -> mean/var; MultiheadAttention
    in_proj_weight/bias -> in_proj.kernel/bias (kernel transposed)."""
    out: dict = {}
    for name, t in state_dict.items():
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        parts = name.split(".")
        leaf = parts[-1]
        path = parts[:-1]
        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            key = "mean"
        elif leaf == "running_var":
            key = "var"
        elif leaf == "in_proj_weight":
            path, key, arr = parts[:-1] + ["in_proj"], "kernel", arr.T
        elif leaf == "in_proj_bias":
            path, key = parts[:-1] + ["in_proj"], "bias"
        elif leaf == "weight":
            if name.endswith("up.weight"):
                key = "kernel"  # ConvTranspose torch layout kept
            elif arr.ndim == 4:
                key, arr = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                if parts[-2] in ("query_feat", "query_embed", "level_embed", "token_embedding"):
                    key = "weight"
                else:
                    key, arr = "kernel", arr.T
            else:
                # 1-D weight: LayerNorm/GN/BN scale
                key = "scale"
        elif leaf == "bias":
            key = "bias"
        elif leaf in ("level_embed", "level_encoding"):
            # bare Parameters (adapter level_embed, encoder level_encoding)
            key = leaf
            path = parts[:-1]
            node = out
            for p in path:
                node = node.setdefault(p, {})
            node[key] = jnp.asarray(arr, dtype)
            continue
        else:
            continue
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[key] = jnp.asarray(arr, dtype)
    return out
