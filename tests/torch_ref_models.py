"""Independent torch re-implementations of the tiny VAE/UNet architectures
following diffusers' module semantics (GroupNorm eps, attention scaling,
GEGLU, skip ordering, timestep embedding). Used by test_activation_parity to
cross-check the JAX models end-to-end from a shared param tree — the
weight-port parity strategy of SURVEY §4 without needing real checkpoints.

Weights load from the omgsr-tpu param tree (HWIO->OIHW, (in,out)->(out,in)),
exercising the exact transposes the safetensors porters invert.
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _conv(p):
    w = torch.from_numpy(np.asarray(p["kernel"], np.float32).transpose(3, 2, 0, 1))
    b = torch.from_numpy(np.asarray(p["bias"], np.float32)) if "bias" in p else None
    return w, b


def _lin(p):
    w = torch.from_numpy(np.asarray(p["kernel"], np.float32).T)
    b = torch.from_numpy(np.asarray(p["bias"], np.float32)) if "bias" in p else None
    return w, b


def _gn(x, p, groups, eps):
    return F.group_norm(
        x, groups,
        torch.from_numpy(np.asarray(p["scale"], np.float32)),
        torch.from_numpy(np.asarray(p["bias"], np.float32)),
        eps,
    )


def _ln(x, p, eps=1e-5):
    return F.layer_norm(
        x, (x.shape[-1],),
        torch.from_numpy(np.asarray(p["scale"], np.float32)),
        torch.from_numpy(np.asarray(p["bias"], np.float32)),
        eps,
    )


def _conv2d(x, p, stride=1, padding=1):
    w, b = _conv(p)
    return F.conv2d(x, w, b, stride=stride, padding=padding)


def _linear(x, p):
    w, b = _lin(p)
    return F.linear(x, w, b)


# ----------------------------------------------------------------------------
# VAE
# ----------------------------------------------------------------------------


def vae_resnet(x, p, groups):
    h = _conv2d(F.silu(_gn(x, p["norm1"], groups, 1e-6)), p["conv1"])
    h = _conv2d(F.silu(_gn(h, p["norm2"], groups, 1e-6)), p["conv2"])
    if "conv_shortcut" in p:
        x = _conv2d(x, p["conv_shortcut"], padding=0)
    return x + h


def vae_attention(x, p, groups):
    b, c, hh, ww = x.shape
    h = _gn(x, p["group_norm"], groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q = _linear(h, p["to_q"])
    k = _linear(h, p["to_k"])
    v = _linear(h, p["to_v"])
    o = F.scaled_dot_product_attention(
        q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)
    ).squeeze(1)
    o = _linear(o, p["to_out"]["0"])
    return x + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def vae_mid(x, p, groups):
    x = vae_resnet(x, p["resnets"]["0"], groups)
    if "attentions" in p:
        x = vae_attention(x, p["attentions"]["0"], groups)
    return vae_resnet(x, p["resnets"]["1"], groups)


def torch_vae_encode_features(params, cfg, x):
    """NCHW pixels -> NCHW moments; mirrors diffusers Encoder.forward."""
    p = params["encoder"]
    g = cfg.norm_num_groups
    h = _conv2d(x, p["conv_in"])
    for i in range(len(cfg.block_out_channels)):
        blk = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            h = vae_resnet(h, blk["resnets"][str(j)], g)
        if "downsamplers" in blk:
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv2d(h, blk["downsamplers"]["0"]["conv"], stride=2, padding=0)
    h = vae_mid(h, p["mid_block"], g)
    h = _conv2d(F.silu(_gn(h, p["conv_norm_out"], g, 1e-6)), p["conv_out"])
    if "quant_conv" in params:
        h = _conv2d(h, params["quant_conv"], padding=0)
    return h


def torch_vae_decode(params, cfg, z):
    if "post_quant_conv" in params:
        z = _conv2d(z, params["post_quant_conv"], padding=0)
    p = params["decoder"]
    g = cfg.norm_num_groups
    h = _conv2d(z, p["conv_in"])
    h = vae_mid(h, p["mid_block"], g)
    for i in range(len(cfg.block_out_channels)):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = vae_resnet(h, blk["resnets"][str(j)], g)
        if "upsamplers" in blk:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv2d(h, blk["upsamplers"]["0"]["conv"])
    h = _conv2d(F.silu(_gn(h, p["conv_norm_out"], g, 1e-6)), p["conv_out"])
    return h


# ----------------------------------------------------------------------------
# UNet
# ----------------------------------------------------------------------------


def unet_resnet(x, p, temb, groups, eps):
    h = _conv2d(F.silu(_gn(x, p["norm1"], groups, eps)), p["conv1"])
    h = h + _linear(F.silu(temb), p["time_emb_proj"])[:, :, None, None]
    h = _conv2d(F.silu(_gn(h, p["norm2"], groups, eps)), p["conv2"])
    if "conv_shortcut" in p:
        x = _conv2d(x, p["conv_shortcut"], padding=0)
    return x + h


def _mha(x, ctx, p, heads):
    b, s, c = x.shape
    q = _linear(x, p["to_q"])
    k = _linear(ctx, p["to_k"])
    v = _linear(ctx, p["to_v"])
    d = q.shape[-1] // heads
    q = q.view(b, s, heads, d).transpose(1, 2)
    k = k.view(b, ctx.shape[1], heads, d).transpose(1, 2)
    v = v.view(b, ctx.shape[1], heads, d).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, s, heads * d)
    return _linear(o, p["to_out"]["0"])


def transformer_block(x, ctx, p, heads):
    x = x + _mha(_ln(x, p["norm1"]), _ln(x, p["norm1"]), p["attn1"], heads)
    x = x + _mha(_ln(x, p["norm2"]), ctx, p["attn2"], heads)
    h = _linear(_ln(x, p["norm3"]), p["ff"]["net"]["0"]["proj"])
    a, gate = h.chunk(2, dim=-1)
    return x + _linear(a * F.gelu(gate), p["ff"]["net"]["2"])


def spatial_transformer(x, ctx, p, heads, groups):
    b, c, hh, ww = x.shape
    res = x
    h = _gn(x, p["norm"], groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    h = _linear(h, p["proj_in"])
    for i in sorted(p["transformer_blocks"], key=int):
        h = transformer_block(h, ctx, p["transformer_blocks"][i], heads)
    h = _linear(h, p["proj_out"])
    return res + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def torch_unet_apply(params, cfg, sample, timestep, ctx):
    """NCHW latent + (B,S,C) context -> NCHW epsilon; diffusers
    UNet2DConditionModel.forward semantics."""
    g = cfg.norm_num_groups
    eps = cfg.norm_eps
    bo = list(cfg.block_out_channels)

    t = torch.full((sample.shape[0],), float(timestep))
    half = bo[0] // 2
    freq = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    emb = t[:, None] * freq[None]
    temb = torch.cat([emb.cos(), emb.sin()], dim=-1)
    temb = _linear(temb, params["time_embedding"]["linear_1"])
    temb = _linear(F.silu(temb), params["time_embedding"]["linear_2"])

    h = _conv2d(sample, params["conv_in"])
    skips = [h]
    for i, btype in enumerate(cfg.down_block_types):
        blk = params["down_blocks"][str(i)]
        heads = cfg.num_attention_heads[i]
        for j in range(cfg.layers_per_block):
            h = unet_resnet(h, blk["resnets"][str(j)], temb, g, eps)
            if "attentions" in blk:
                h = spatial_transformer(h, ctx, blk["attentions"][str(j)], heads, g)
            skips.append(h)
        if "downsamplers" in blk:
            h = _conv2d(h, blk["downsamplers"]["0"]["conv"], stride=2, padding=1)
            skips.append(h)

    mid = params["mid_block"]
    h = unet_resnet(h, mid["resnets"]["0"], temb, g, eps)
    h = spatial_transformer(h, ctx, mid["attentions"]["0"], cfg.num_attention_heads[-1], g)
    h = unet_resnet(h, mid["resnets"]["1"], temb, g, eps)

    rheads = list(reversed(cfg.num_attention_heads))
    for i, btype in enumerate(cfg.up_block_types):
        blk = params["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = unet_resnet(h, blk["resnets"][str(j)], temb, g, eps)
            if "attentions" in blk:
                h = spatial_transformer(h, ctx, blk["attentions"][str(j)], rheads[i], g)
        if "upsamplers" in blk:
            h = F.interpolate(h, scale_factor=2.0, mode="nearest")
            h = _conv2d(h, blk["upsamplers"]["0"]["conv"])

    h = _conv2d(F.silu(_gn(h, params["conv_norm_out"], g, eps)), params["conv_out"])
    return h


# ----------------------------------------------------------------------------
# FLUX DiT
# ----------------------------------------------------------------------------


def _rope_cos_sin_torch(ids, axes_dims, theta=10000):
    outs_cos, outs_sin = [], []
    for a, d in enumerate(axes_dims):
        half = d // 2
        freqs = 1.0 / (theta ** (torch.arange(half, dtype=torch.float64) * 2.0 / d))
        angle = ids[:, a].double()[:, None] * freqs[None, :]
        outs_cos.append(angle.cos())
        outs_sin.append(angle.sin())
    return torch.cat(outs_cos, -1).float(), torch.cat(outs_sin, -1).float()


def _apply_rope_torch(x, cos, sin):
    b, s, h, d = x.shape
    xf = x.reshape(b, s, h, d // 2, 2)
    a, bb = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    return torch.stack([a * c - bb * sn, bb * c + a * sn], dim=-1).reshape(b, s, h, d)


def _rms(x, p, eps=1e-6):
    w = torch.from_numpy(np.asarray(p["scale"], np.float32))
    return x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + eps) * w


def _heads_t(x, n):
    b, s, d = x.shape
    return x.view(b, s, n, d // n)


def _mlp_embed(p, x):
    return _linear(F.silu(_linear(x, p["linear_1"])), p["linear_2"])


def _tstep_embed_torch(t, dim=256):
    half = dim // 2
    freq = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    emb = t[:, None] * freq[None]
    return torch.cat([emb.cos(), emb.sin()], dim=-1)


def torch_flux_apply(params, cfg, hidden, timestep, guidance, pooled, ctx, txt_ids, img_ids):
    """(B,S,64) packed latents etc. -> velocity; diffusers
    FluxTransformer2DModel semantics."""
    n = cfg.num_attention_heads
    img = _linear(hidden, params["x_embedder"])
    txt = _linear(ctx, params["context_embedder"])

    b = img.shape[0]
    t = torch.full((b,), float(timestep)) * 1000.0
    temb = _mlp_embed(params["time_text_embed"]["timestep_embedder"], _tstep_embed_torch(t))
    if cfg.guidance_embeds:
        g = torch.full((b,), float(guidance)) * 1000.0
        temb = temb + _mlp_embed(params["time_text_embed"]["guidance_embedder"], _tstep_embed_torch(g))
    temb = temb + _mlp_embed(params["time_text_embed"]["text_embedder"], pooled)

    ids = torch.cat([txt_ids, img_ids], dim=0)
    cos, sin = _rope_cos_sin_torch(ids, cfg.axes_dims_rope, cfg.rope_theta)

    def modulate(x, shift, scale):
        xn = F.layer_norm(x, (x.shape[-1],), eps=1e-6)
        return xn * (1 + scale[:, None]) + shift[:, None]

    for i in sorted(params["transformer_blocks"], key=int):
        p = params["transformer_blocks"][i]
        mod = _linear(F.silu(temb), p["norm1"]["linear"]).chunk(6, -1)
        cmod = _linear(F.silu(temb), p["norm1_context"]["linear"]).chunk(6, -1)
        img_n = modulate(img, mod[0], mod[1])
        txt_n = modulate(txt, cmod[0], cmod[1])
        ap = p["attn"]
        q = _rms(_heads_t(_linear(img_n, ap["to_q"]), n), ap["norm_q"])
        k = _rms(_heads_t(_linear(img_n, ap["to_k"]), n), ap["norm_k"])
        v = _heads_t(_linear(img_n, ap["to_v"]), n)
        tq = _rms(_heads_t(_linear(txt_n, ap["add_q_proj"]), n), ap["norm_added_q"])
        tk = _rms(_heads_t(_linear(txt_n, ap["add_k_proj"]), n), ap["norm_added_k"])
        tv = _heads_t(_linear(txt_n, ap["add_v_proj"]), n)
        q = torch.cat([tq, q], dim=1)
        k = torch.cat([tk, k], dim=1)
        v = torch.cat([tv, v], dim=1)
        q = _apply_rope_torch(q, cos, sin)
        k = _apply_rope_torch(k, cos, sin)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        ).transpose(1, 2)
        o = o.reshape(o.shape[0], o.shape[1], -1)
        t_len = txt.shape[1]
        img = img + mod[2][:, None] * _linear(o[:, t_len:], ap["to_out"]["0"])
        txt = txt + cmod[2][:, None] * _linear(o[:, :t_len], ap["to_add_out"])
        h = modulate(img, mod[3], mod[4])
        h = F.gelu(_linear(h, p["ff"]["net"]["0"]["proj"]), approximate="tanh")
        img = img + mod[5][:, None] * _linear(h, p["ff"]["net"]["2"])
        ch = modulate(txt, cmod[3], cmod[4])
        ch = F.gelu(_linear(ch, p["ff_context"]["net"]["0"]["proj"]), approximate="tanh")
        txt = txt + cmod[5][:, None] * _linear(ch, p["ff_context"]["net"]["2"])

    x = torch.cat([txt, img], dim=1)
    for i in sorted(params["single_transformer_blocks"], key=int):
        p = params["single_transformer_blocks"][i]
        shift, scale, gate = _linear(F.silu(temb), p["norm"]["linear"]).chunk(3, -1)
        xn = modulate(x, shift, scale)
        ap = p["attn"]
        q = _rms(_heads_t(_linear(xn, ap["to_q"]), n), ap["norm_q"])
        k = _rms(_heads_t(_linear(xn, ap["to_k"]), n), ap["norm_k"])
        v = _heads_t(_linear(xn, ap["to_v"]), n)
        q = _apply_rope_torch(q, cos, sin)
        k = _apply_rope_torch(k, cos, sin)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        ).transpose(1, 2)
        o = o.reshape(o.shape[0], o.shape[1], -1)
        mlp = F.gelu(_linear(xn, p["proj_mlp"]), approximate="tanh")
        x = x + gate[:, None] * _linear(torch.cat([o, mlp], dim=-1), p["proj_out"])
    img = x[:, txt.shape[1]:]

    scale, shift = _linear(F.silu(temb), params["norm_out"]["linear"]).chunk(2, -1)
    img = F.layer_norm(img, (img.shape[-1],), eps=1e-6) * (1 + scale[:, None]) + shift[:, None]
    return _linear(img, params["proj_out"])


# ----------------------------------------------------------------------------
# DINOv3 ConvNeXt feature extractor + DISTS
# ----------------------------------------------------------------------------


def _ln_cf(x, p, eps=1e-6):
    """channels-first LayerNorm (normalize over C), as in the DINOv3 tree."""
    w = torch.from_numpy(np.asarray(p["scale"], np.float32))
    b = torch.from_numpy(np.asarray(p["bias"], np.float32))
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    x = (x - u) / torch.sqrt(s + eps)
    return w[:, None, None] * x + b[:, None, None]


def convnext_block(x, p):
    inp = x
    w, b = _conv(p["dwconv"])
    x = F.conv2d(x, w, b, padding=3, groups=x.shape[1])
    x = x.permute(0, 2, 3, 1)
    x = _ln(x, p["norm"], eps=1e-6)
    x = _linear(x, p["pwconv1"])
    x = F.gelu(x)
    x = _linear(x, p["pwconv2"])
    x = torch.from_numpy(np.asarray(p["gamma"], np.float32)) * x
    x = x.permute(0, 3, 1, 2)
    return inp + x


def torch_convnext_features(params, x, num_stages=3):
    feats = []
    for i in range(num_stages):
        dl = params["downsample_layers"][str(i)]
        if i == 0:
            w, b = _conv(dl["0"])
            x = F.conv2d(x, w, b, stride=4)
            x = _ln_cf(x, dl["1"])
        else:
            x = _ln_cf(x, dl["0"])
            w, b = _conv(dl["1"])
            x = F.conv2d(x, w, b, stride=2)
        for j in sorted(params["stages"][str(i)], key=int):
            x = convnext_block(x, params["stages"][str(i)][j])
        feats.append(x)
    return feats


def torch_dists(backbone_params, channels, x, y):
    """DISTS score with Hanning L2-pooling, reference formula
    (dinov3_gan/dinov3_convnext_dists.py:79-108)."""
    a = np.hanning(5)[1:-1]
    g = np.outer(a, a)
    g = torch.from_numpy((g / g.sum()).astype(np.float32))

    def l2pool(f):
        c = f.shape[1]
        k = g[None, None].repeat(c, 1, 1, 1)
        return (F.conv2d(f**2, k, stride=1, padding=1, groups=c) + 1e-12).sqrt()

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, -1, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, -1, 1, 1)

    def feats(img):
        img01 = img * 0.5 + 0.5
        h = (img01 - mean) / std
        fs = torch_convnext_features(backbone_params, h)
        return [img01] + [l2pool(f) for f in fs]

    f0 = feats(x)
    f1 = feats(y)
    w = 1.0 / (2 * sum(channels))
    c1 = c2 = 1e-6
    dist1 = dist2 = 0.0
    for a_, b_ in zip(f0, f1):
        xm = a_.mean([2, 3], keepdim=True)
        ym = b_.mean([2, 3], keepdim=True)
        s1 = (2 * xm * ym + c1) / (xm**2 + ym**2 + c1)
        dist1 = dist1 + (w * s1).sum(1, keepdim=True)
        xv = ((a_ - xm) ** 2).mean([2, 3], keepdim=True)
        yv = ((b_ - ym) ** 2).mean([2, 3], keepdim=True)
        cov = (a_ * b_).mean([2, 3], keepdim=True) - xm * ym
        s2 = (2 * cov + c2) / (xv + yv + c2)
        dist2 = dist2 + (w * s2).sum(1, keepdim=True)
    return float((1 - (dist1 + dist2)).mean())
