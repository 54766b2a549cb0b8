"""FLUX.1-dev DiT (FluxTransformer2DModel), TPU-native.

Re-implements the 12B denoiser the reference loads from diffusers
(train/train_omgsr_f.py:278, infer/omgsr_f_infer_model.py:103): x_embedder
over packed 2x2 latents, 19 dual-stream + 38 single-stream blocks, joint
text-image attention with 3-axis RoPE over (txt_ids, img_ids), per-head QK
RMS-norm, AdaLayerNorm-Zero modulation from timestep+guidance+pooled-CLIP
embeddings.

Param-tree paths mirror HF safetensors keys (transformer_blocks.0.attn.to_q,
single_transformer_blocks.7.proj_mlp, ...). Sequence layout in joint
attention is [text; image], matching diffusers' FluxAttnProcessor.

Timestep/guidance enter as sigmas in [0,1] and are scaled x1000 before the
sinusoidal projection (diffusers FluxTransformer2DModel.forward semantics —
the reference passes sigma_t directly, train/train_omgsr_f.py:506-515).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.configs import FluxConfig
from omgsr_tpu.models.layers import (
    dense,
    init_dense,
    init_norm,
    init_rms_norm,
    layer_norm,
    rms_norm,
    silu,
    timestep_embedding,
)
from omgsr_tpu.ops.attention import dot_product_attention


# ----------------------------------------------------------------------------
# RoPE
# ----------------------------------------------------------------------------


def rope_cos_sin(ids: jnp.ndarray, axes_dims, theta: int = 10000):
    """ids (S, n_axes) -> (cos, sin) each (S, sum(axes_dims)//2).

    Per axis a with dim d: freqs_j = theta^(-2j/d) for j < d/2; angle =
    pos_a * freqs_j. Matches diffusers' FluxPosEmbed/get_1d_rotary_pos_embed
    (freqs computed in float64, used as float32).
    """
    outs_cos, outs_sin = [], []
    for a, d in enumerate(axes_dims):
        half = d // 2
        freqs = 1.0 / (theta ** (np.arange(0, half, dtype=np.float64) * 2.0 / d))
        angle = ids[:, a].astype(jnp.float32)[:, None] * jnp.asarray(
            freqs, jnp.float32
        )[None, :]
        outs_cos.append(jnp.cos(angle))
        outs_sin.append(jnp.sin(angle))
    cos = jnp.concatenate(outs_cos, axis=-1).astype(jnp.float32)
    sin = jnp.concatenate(outs_sin, axis=-1).astype(jnp.float32)
    return cos, sin


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x (B, S, H, D) with D = 2 * cos.shape[-1]; rotates interleaved pairs:
    (a, b) -> (a*c - b*s, b*c + a*s)."""
    b, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, d // 2, 2)
    a, bb = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    out = jnp.stack([a * c - bb * sn, bb * c + a * sn], axis=-1)
    return out.reshape(b, s, h, d).astype(x.dtype)


# ----------------------------------------------------------------------------
# init
# ----------------------------------------------------------------------------


def _init_mlp_embedder(key, in_dim, dim, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": init_dense(k1, in_dim, dim, dtype=dtype),
        "linear_2": init_dense(k2, dim, dim, dtype=dtype),
    }


def _init_joint_attn(key, dim, head_dim, dtype):
    ks = jax.random.split(key, 8)
    return {
        "to_q": init_dense(ks[0], dim, dim, dtype=dtype),
        "to_k": init_dense(ks[1], dim, dim, dtype=dtype),
        "to_v": init_dense(ks[2], dim, dim, dtype=dtype),
        "add_q_proj": init_dense(ks[3], dim, dim, dtype=dtype),
        "add_k_proj": init_dense(ks[4], dim, dim, dtype=dtype),
        "add_v_proj": init_dense(ks[5], dim, dim, dtype=dtype),
        "norm_q": init_rms_norm(head_dim, dtype),
        "norm_k": init_rms_norm(head_dim, dtype),
        "norm_added_q": init_rms_norm(head_dim, dtype),
        "norm_added_k": init_rms_norm(head_dim, dtype),
        "to_out": {"0": init_dense(ks[6], dim, dim, dtype=dtype)},
        "to_add_out": init_dense(ks[7], dim, dim, dtype=dtype),
    }


def _init_dual_block(key, cfg: FluxConfig, dtype):
    dim = cfg.inner_dim
    mlp = int(dim * cfg.mlp_ratio)
    ks = jax.random.split(key, 7)
    return {
        "norm1": {"linear": init_dense(ks[0], dim, 6 * dim, dtype=dtype)},
        "norm1_context": {"linear": init_dense(ks[1], dim, 6 * dim, dtype=dtype)},
        "attn": _init_joint_attn(ks[2], dim, cfg.attention_head_dim, dtype),
        "ff": {
            "net": {
                "0": {"proj": init_dense(ks[3], dim, mlp, dtype=dtype)},
                "2": init_dense(ks[4], mlp, dim, dtype=dtype),
            }
        },
        "ff_context": {
            "net": {
                "0": {"proj": init_dense(ks[5], dim, mlp, dtype=dtype)},
                "2": init_dense(ks[6], mlp, dim, dtype=dtype),
            }
        },
    }


def _init_single_block(key, cfg: FluxConfig, dtype):
    dim = cfg.inner_dim
    mlp = int(dim * cfg.mlp_ratio)
    ks = jax.random.split(key, 6)
    return {
        "norm": {"linear": init_dense(ks[0], dim, 3 * dim, dtype=dtype)},
        "attn": {
            "to_q": init_dense(ks[1], dim, dim, dtype=dtype),
            "to_k": init_dense(ks[2], dim, dim, dtype=dtype),
            "to_v": init_dense(ks[3], dim, dim, dtype=dtype),
            "norm_q": init_rms_norm(cfg.attention_head_dim, dtype),
            "norm_k": init_rms_norm(cfg.attention_head_dim, dtype),
        },
        "proj_mlp": init_dense(ks[4], dim, mlp, dtype=dtype),
        "proj_out": init_dense(ks[5], dim + mlp, dim, dtype=dtype),
    }


def init_flux(key, cfg: FluxConfig, dtype=jnp.float32):
    dim = cfg.inner_dim
    keys = iter(jax.random.split(key, cfg.num_layers + cfg.num_single_layers + 16))
    params = {
        "x_embedder": init_dense(next(keys), cfg.in_channels, dim, dtype=dtype),
        "context_embedder": init_dense(next(keys), cfg.joint_attention_dim, dim, dtype=dtype),
        "time_text_embed": {
            "timestep_embedder": _init_mlp_embedder(next(keys), 256, dim, dtype),
            "text_embedder": _init_mlp_embedder(next(keys), cfg.pooled_projection_dim, dim, dtype),
        },
        "transformer_blocks": {
            str(i): _init_dual_block(next(keys), cfg, dtype) for i in range(cfg.num_layers)
        },
        "single_transformer_blocks": {
            str(i): _init_single_block(next(keys), cfg, dtype)
            for i in range(cfg.num_single_layers)
        },
        "norm_out": {"linear": init_dense(next(keys), dim, 2 * dim, dtype=dtype)},
        "proj_out": init_dense(next(keys), dim, cfg.in_channels, dtype=dtype),
    }
    if cfg.guidance_embeds:
        params["time_text_embed"]["guidance_embedder"] = _init_mlp_embedder(next(keys), 256, dim, dtype)
    return params


# ----------------------------------------------------------------------------
# apply
# ----------------------------------------------------------------------------


def _mlp_embedder(p, x):
    return dense(p["linear_2"], silu(dense(p["linear_1"], x)))


def _time_text_embed(p, cfg, timestep, guidance, pooled, dtype):
    t_proj = timestep_embedding(timestep * 1000.0, 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
    emb = _mlp_embedder(p["timestep_embedder"], t_proj.astype(dtype))
    if cfg.guidance_embeds:
        g_proj = timestep_embedding(guidance * 1000.0, 256, flip_sin_to_cos=True, downscale_freq_shift=0.0)
        emb = emb + _mlp_embedder(p["guidance_embedder"], g_proj.astype(dtype))
    emb = emb + _mlp_embedder(p["text_embedder"], pooled.astype(dtype))
    return emb


def _modulate(x, shift, scale):
    return layer_norm(None, x, eps=1e-6) * (1 + scale[:, None, :]) + shift[:, None, :]


def _heads(x, n):
    b, s, d = x.shape
    return x.reshape(b, s, n, d // n)


def _joint_attention(p, cfg, img, txt, cos, sin):
    n = cfg.num_attention_heads
    q = rms_norm(p["norm_q"], _heads(dense(p["to_q"], img), n))
    k = rms_norm(p["norm_k"], _heads(dense(p["to_k"], img), n))
    v = _heads(dense(p["to_v"], img), n)
    tq = rms_norm(p["norm_added_q"], _heads(dense(p["add_q_proj"], txt), n))
    tk = rms_norm(p["norm_added_k"], _heads(dense(p["add_k_proj"], txt), n))
    tv = _heads(dense(p["add_v_proj"], txt), n)
    # sequence layout: [text; image]
    q = jnp.concatenate([tq, q], axis=1)
    k = jnp.concatenate([tk, k], axis=1)
    v = jnp.concatenate([tv, v], axis=1)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    o = dot_product_attention(q, k, v)
    b, s, h, d = o.shape
    o = o.reshape(b, s, h * d)
    t_len = txt.shape[1]
    txt_o, img_o = o[:, :t_len], o[:, t_len:]
    return dense(p["to_out"]["0"], img_o), dense(p["to_add_out"], txt_o)


def _dual_block(p, cfg, img, txt, temb, cos, sin):
    mod = dense(p["norm1"]["linear"], silu(temb))
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)
    cmod = dense(p["norm1_context"]["linear"], silu(temb))
    c_sh_msa, c_sc_msa, c_g_msa, c_sh_mlp, c_sc_mlp, c_g_mlp = jnp.split(cmod, 6, axis=-1)

    img_n = _modulate(img, sh_msa, sc_msa)
    txt_n = _modulate(txt, c_sh_msa, c_sc_msa)
    img_attn, txt_attn = _joint_attention(p["attn"], cfg, img_n, txt_n, cos, sin)

    img = img + g_msa[:, None, :] * img_attn
    h = _modulate(img, sh_mlp, sc_mlp)
    h = dense(p["ff"]["net"]["0"]["proj"], h)
    h = jax.nn.gelu(h, approximate=True)
    img = img + g_mlp[:, None, :] * dense(p["ff"]["net"]["2"], h)

    txt = txt + c_g_msa[:, None, :] * txt_attn
    ch = _modulate(txt, c_sh_mlp, c_sc_mlp)
    ch = dense(p["ff_context"]["net"]["0"]["proj"], ch)
    ch = jax.nn.gelu(ch, approximate=True)
    txt = txt + c_g_mlp[:, None, :] * dense(p["ff_context"]["net"]["2"], ch)
    return img, txt


def _single_block(p, cfg, x, temb, cos, sin):
    n = cfg.num_attention_heads
    mod = dense(p["norm"]["linear"], silu(temb))
    shift, scale, gate = jnp.split(mod, 3, axis=-1)
    xn = _modulate(x, shift, scale)
    q = rms_norm(p["attn"]["norm_q"], _heads(dense(p["attn"]["to_q"], xn), n))
    k = rms_norm(p["attn"]["norm_k"], _heads(dense(p["attn"]["to_k"], xn), n))
    v = _heads(dense(p["attn"]["to_v"], xn), n)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    o = dot_product_attention(q, k, v)
    b, s, h, d = o.shape
    attn_out = o.reshape(b, s, h * d)
    mlp = jax.nn.gelu(dense(p["proj_mlp"], xn), approximate=True)
    out = dense(p["proj_out"], jnp.concatenate([attn_out, mlp], axis=-1))
    return x + gate[:, None, :] * out


def stack_block_params(params):
    """Stack the per-block param subtrees along a leading axis so the block
    loops run as lax.scan (one compiled block body instead of 19+38 unrolled
    copies — cuts 12B-model compile time dramatically). Returns a new params
    dict with "transformer_blocks"/"single_transformer_blocks" replaced by
    stacked trees; flux_apply detects the stacked form automatically.
    """
    import numpy as np

    def stack(group):
        keys = sorted(group, key=int)
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[group[k] for k in keys])

    out = dict(params)
    out["transformer_blocks"] = {"stacked": stack(params["transformer_blocks"])}
    out["single_transformer_blocks"] = {"stacked": stack(params["single_transformer_blocks"])}
    return out


def flux_apply(
    params,
    cfg: FluxConfig,
    hidden_states,
    timestep,
    guidance,
    pooled_projections,
    encoder_hidden_states,
    txt_ids,
    img_ids,
):
    """hidden_states (B, S_img, 64) packed latents, timestep/guidance (B,)
    sigmas in [0,1], pooled (B, 768), encoder_hidden_states (B, S_txt, 4096),
    txt_ids (S_txt, 3), img_ids (S_img, 3) -> velocity prediction (B, S_img, 64).
    """
    dtype = hidden_states.dtype
    img = dense(params["x_embedder"], hidden_states)
    txt = dense(params["context_embedder"], encoder_hidden_states)

    timestep = jnp.broadcast_to(jnp.asarray(timestep, jnp.float32), (img.shape[0],))
    if guidance is not None:
        guidance = jnp.broadcast_to(jnp.asarray(guidance, jnp.float32), (img.shape[0],))
    temb = _time_text_embed(params["time_text_embed"], cfg, timestep, guidance, pooled_projections, dtype)

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = rope_cos_sin(ids, cfg.axes_dims_rope, cfg.rope_theta)

    scanned = "stacked" in params["transformer_blocks"]
    # per-block remat (cfg.remat_blocks): under reverse-mode AD the scan
    # saves only each block's carry and recomputes the block body, instead
    # of storing attention/MLP internals for all 19+38 blocks
    ckpt = jax.checkpoint if cfg.remat_blocks else (lambda f: f)
    if scanned:
        @ckpt
        def dual_body(carry, bp):
            i, t = carry
            i, t = _dual_block(bp, cfg, i, t, temb, cos, sin)
            return (i, t), None

        (img, txt), _ = jax.lax.scan(
            dual_body, (img, txt), params["transformer_blocks"]["stacked"]
        )
    else:
        for i in sorted(params["transformer_blocks"], key=int):
            img, txt = _dual_block(params["transformer_blocks"][i], cfg, img, txt, temb, cos, sin)

    x = jnp.concatenate([txt, img], axis=1)
    if scanned:
        @ckpt
        def single_body(carry, bp):
            return _single_block(bp, cfg, carry, temb, cos, sin), None

        x, _ = jax.lax.scan(single_body, x, params["single_transformer_blocks"]["stacked"])
    else:
        for i in sorted(params["single_transformer_blocks"], key=int):
            x = _single_block(params["single_transformer_blocks"][i], cfg, x, temb, cos, sin)
    img = x[:, txt.shape[1] :]

    # AdaLayerNormContinuous: chunk order is (scale, shift)
    mod = dense(params["norm_out"]["linear"], silu(temb))
    scale, shift = jnp.split(mod, 2, axis=-1)
    img = layer_norm(None, img, eps=1e-6) * (1 + scale[:, None, :]) + shift[:, None, :]
    return dense(params["proj_out"], img)
