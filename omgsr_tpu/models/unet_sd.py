"""SD2.1 UNet2DConditionModel, TPU-native.

Re-implements the denoiser the reference loads from diffusers
(train/train_omgsr_s.py:228, infer/omgsr_s_infer_model.py:15): conv in/out,
4 down/up stages of ResNet blocks with timestep conditioning, spatial
transformers with self+cross attention (cross dim 1024), linear projections
(SD2.x), sinusoidal timestep embedding + MLP.

Param-tree paths mirror the HF safetensors keys
(down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_q ...). NHWC.

OMGSR only ever calls this with a *single fixed timestep* (273), so the
timestep embedding folds into constants under jit — XLA hoists it out of the
hot path automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omgsr_tpu.models.configs import UNetConfig
from omgsr_tpu.models.layers import (
    conv2d,
    dense,
    gelu,
    group_norm,
    group_norm_silu,
    init_conv,
    init_dense,
    init_norm,
    layer_norm,
    nearest_upsample_2x,
    silu,
    timestep_embedding,
    upsample_conv_2x,
)
from omgsr_tpu.ops.attention import dot_product_attention

_GN_EPS_TRANSFORMER = 1e-6  # diffusers Transformer2DModel GroupNorm eps


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------


def _init_resnet(key, in_ch, out_ch, temb_ch, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "norm1": init_norm(in_ch, dtype),
        "conv1": init_conv(ks[0], 3, 3, in_ch, out_ch, dtype=dtype),
        "time_emb_proj": init_dense(ks[1], temb_ch, out_ch, dtype=dtype),
        "norm2": init_norm(out_ch, dtype),
        "conv2": init_conv(ks[2], 3, 3, out_ch, out_ch, dtype=dtype),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv(ks[3], 1, 1, in_ch, out_ch, dtype=dtype)
    return p


def _init_attention(key, query_dim, context_dim, inner_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "to_q": init_dense(ks[0], query_dim, inner_dim, use_bias=False, dtype=dtype),
        "to_k": init_dense(ks[1], context_dim, inner_dim, use_bias=False, dtype=dtype),
        "to_v": init_dense(ks[2], context_dim, inner_dim, use_bias=False, dtype=dtype),
        "to_out": {"0": init_dense(ks[3], inner_dim, query_dim, dtype=dtype)},
    }


def _init_transformer_block(key, dim, cross_dim, dtype):
    ks = jax.random.split(key, 4)
    return {
        "norm1": init_norm(dim, dtype),
        "attn1": _init_attention(ks[0], dim, dim, dim, dtype),
        "norm2": init_norm(dim, dtype),
        "attn2": _init_attention(ks[1], dim, cross_dim, dim, dtype),
        "norm3": init_norm(dim, dtype),
        "ff": {
            "net": {
                "0": {"proj": init_dense(ks[2], dim, dim * 8, dtype=dtype)},  # GEGLU
                "2": init_dense(ks[3], dim * 4, dim, dtype=dtype),
            }
        },
    }


def _init_spatial_transformer(key, ch, n_layers, cross_dim, dtype):
    ks = jax.random.split(key, n_layers + 2)
    return {
        "norm": init_norm(ch, dtype),
        "proj_in": init_dense(ks[0], ch, ch, dtype=dtype),
        "transformer_blocks": {
            str(i): _init_transformer_block(ks[1 + i], ch, cross_dim, dtype)
            for i in range(n_layers)
        },
        "proj_out": init_dense(ks[-1], ch, ch, dtype=dtype),
    }


def init_unet(key, cfg: UNetConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 256))
    bo = list(cfg.block_out_channels)
    temb_ch = bo[0] * 4
    tl = cfg.transformer_layers_per_block

    params = {
        "conv_in": init_conv(next(keys), 3, 3, cfg.in_channels, bo[0], dtype=dtype),
        "time_embedding": {
            "linear_1": init_dense(next(keys), bo[0], temb_ch, dtype=dtype),
            "linear_2": init_dense(next(keys), temb_ch, temb_ch, dtype=dtype),
        },
    }

    # down blocks
    down = {}
    ch = bo[0]
    for i, (btype, out_ch) in enumerate(zip(cfg.down_block_types, bo)):
        blk = {"resnets": {}}
        if "CrossAttn" in btype:
            blk["attentions"] = {}
        for j in range(cfg.layers_per_block):
            in_ch = ch if j == 0 else out_ch
            blk["resnets"][str(j)] = _init_resnet(next(keys), in_ch, out_ch, temb_ch, dtype)
            if "CrossAttn" in btype:
                blk["attentions"][str(j)] = _init_spatial_transformer(
                    next(keys), out_ch, tl, cfg.cross_attention_dim, dtype
                )
        ch = out_ch
        if i < len(bo) - 1:
            blk["downsamplers"] = {"0": {"conv": init_conv(next(keys), 3, 3, ch, ch, dtype=dtype)}}
        down[str(i)] = blk
    params["down_blocks"] = down

    # mid block
    params["mid_block"] = {
        "resnets": {
            "0": _init_resnet(next(keys), ch, ch, temb_ch, dtype),
            "1": _init_resnet(next(keys), ch, ch, temb_ch, dtype),
        },
        "attentions": {
            "0": _init_spatial_transformer(next(keys), ch, tl, cfg.cross_attention_dim, dtype)
        },
    }

    # up blocks
    rbo = list(reversed(bo))
    up = {}
    prev_out = rbo[0]
    for i, (btype, out_ch) in enumerate(zip(cfg.up_block_types, rbo)):
        skip_ch = rbo[min(i + 1, len(rbo) - 1)]
        blk = {"resnets": {}}
        if "CrossAttn" in btype:
            blk["attentions"] = {}
        n_res = cfg.layers_per_block + 1
        for j in range(n_res):
            res_skip = skip_ch if j == n_res - 1 else out_ch
            res_in = prev_out if j == 0 else out_ch
            blk["resnets"][str(j)] = _init_resnet(next(keys), res_in + res_skip, out_ch, temb_ch, dtype)
            if "CrossAttn" in btype:
                blk["attentions"][str(j)] = _init_spatial_transformer(
                    next(keys), out_ch, tl, cfg.cross_attention_dim, dtype
                )
        prev_out = out_ch
        if i < len(rbo) - 1:
            blk["upsamplers"] = {"0": {"conv": init_conv(next(keys), 3, 3, out_ch, out_ch, dtype=dtype)}}
        up[str(i)] = blk
    params["up_blocks"] = up

    params["conv_norm_out"] = init_norm(bo[0], dtype)
    params["conv_out"] = init_conv(next(keys), 3, 3, bo[0], cfg.out_channels, dtype=dtype)
    return params


# ----------------------------------------------------------------------------
# apply
# ----------------------------------------------------------------------------


def _resnet(p, x, temb, groups, eps):
    h = group_norm_silu(p["norm1"], x, groups, eps)
    h = conv2d(p["conv1"], h, padding=1)
    t = dense(p["time_emb_proj"], silu(temb))
    h = h + t[:, None, None, :]
    h = group_norm_silu(p["norm2"], h, groups, eps)
    h = conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def _attention(p, x, context, heads):
    """x (B,S,C); context (B,S_kv,C_ctx)."""
    b, s, c = x.shape
    q = dense(p["to_q"], x)
    k = dense(p["to_k"], context)
    v = dense(p["to_v"], context)
    d = q.shape[-1] // heads
    q = q.reshape(b, s, heads, d)
    k = k.reshape(b, context.shape[1], heads, d)
    v = v.reshape(b, context.shape[1], heads, d)
    o = dot_product_attention(q, k, v).reshape(b, s, heads * d)
    return dense(p["to_out"]["0"], o)


def _transformer_block(p, x, context, heads):
    x = x + _attention(p["attn1"], layer_norm(p["norm1"], x), layer_norm(p["norm1"], x), heads)
    x = x + _attention(p["attn2"], layer_norm(p["norm2"], x), context, heads)
    h = layer_norm(p["norm3"], x)
    h = dense(p["ff"]["net"]["0"]["proj"], h)
    a, gate = jnp.split(h, 2, axis=-1)
    h = a * gelu(gate)
    return x + dense(p["ff"]["net"]["2"], h)


def _spatial_transformer(p, x, context, heads, groups):
    b, hh, ww, c = x.shape
    res = x
    h = group_norm(p["norm"], x, groups, _GN_EPS_TRANSFORMER)
    h = h.reshape(b, hh * ww, c)
    h = dense(p["proj_in"], h)
    for i in sorted(p["transformer_blocks"], key=int):
        h = _transformer_block(p["transformer_blocks"][i], h, context, heads)
    h = dense(p["proj_out"], h)
    return res + h.reshape(b, hh, ww, c)


def unet_apply(params, cfg: UNetConfig, sample, timesteps, encoder_hidden_states):
    """sample (B,h,w,4) latent, timesteps scalar or (B,), context (B,77,1024)
    -> epsilon prediction (B,h,w,4).

    Mirrors diffusers UNet2DConditionModel.forward dataflow (the reference's
    one_mid_timestep_pred calls it at train/train_omgsr_s.py:432-436).
    """
    g = cfg.norm_num_groups
    eps = cfg.norm_eps
    bo = list(cfg.block_out_channels)
    dtype = sample.dtype

    timesteps = jnp.broadcast_to(jnp.asarray(timesteps), (sample.shape[0],))
    temb = timestep_embedding(timesteps, bo[0], cfg.flip_sin_to_cos, cfg.freq_shift)
    temb = dense(params["time_embedding"]["linear_1"], temb.astype(dtype))
    temb = dense(params["time_embedding"]["linear_2"], silu(temb))

    h = conv2d(params["conv_in"], sample, padding=1)
    skips = [h]

    # down
    for i, btype in enumerate(cfg.down_block_types):
        blk = params["down_blocks"][str(i)]
        heads = cfg.num_attention_heads[i]
        for j in range(cfg.layers_per_block):
            h = _resnet(blk["resnets"][str(j)], h, temb, g, eps)
            if "attentions" in blk:
                h = _spatial_transformer(blk["attentions"][str(j)], h, encoder_hidden_states, heads, g)
            skips.append(h)
        if "downsamplers" in blk:
            h = conv2d(blk["downsamplers"]["0"]["conv"], h, stride=2, padding=1)
            skips.append(h)

    # mid
    mid = params["mid_block"]
    h = _resnet(mid["resnets"]["0"], h, temb, g, eps)
    h = _spatial_transformer(mid["attentions"]["0"], h, encoder_hidden_states, cfg.num_attention_heads[-1], g)
    h = _resnet(mid["resnets"]["1"], h, temb, g, eps)

    # up
    rheads = list(reversed(cfg.num_attention_heads))
    for i, btype in enumerate(cfg.up_block_types):
        blk = params["up_blocks"][str(i)]
        n_res = cfg.layers_per_block + 1
        for j in range(n_res):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            h = _resnet(blk["resnets"][str(j)], h, temb, g, eps)
            if "attentions" in blk:
                h = _spatial_transformer(blk["attentions"][str(j)], h, encoder_hidden_states, rheads[i], g)
        if "upsamplers" in blk:
            h = upsample_conv_2x(blk["upsamplers"]["0"]["conv"], h)

    h = group_norm_silu(params["conv_norm_out"], h, g, eps)
    h = conv2d(params["conv_out"], h, padding=1)
    return h
