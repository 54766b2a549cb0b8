"""CLIP text encoder (transformers CLIPTextModel layout).

Covers both towers OMGSR needs:
  * SD2.1's OpenCLIP ViT-H text encoder (hidden 1024, 23 layers, gelu) used
    to pre-encode the fixed prompt (train/train_omgsr_s.py:172-199).
  * FLUX's CLIP-L (hidden 768, 12 layers, quick_gelu) whose *pooled* output
    feeds the DiT modulation (via FluxPipeline.encode_prompt,
    train/train_omgsr_f.py:244-251).

Param paths mirror HF keys under text_model.* . Causal masking follows CLIP
(every prefix attends to itself), pooled output is the final-layer-norm
hidden state at each sequence's EOS position.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omgsr_tpu.models.configs import CLIPTextConfig
from omgsr_tpu.models.layers import dense, init_dense, init_norm, layer_norm
from omgsr_tpu.ops.attention import dot_product_attention


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: jax.nn.gelu(x, approximate=False)


def _init_layer(key, cfg: CLIPTextConfig, dtype):
    d = cfg.hidden_size
    ks = jax.random.split(key, 6)
    return {
        "layer_norm1": init_norm(d, dtype),
        "self_attn": {
            "q_proj": init_dense(ks[0], d, d, dtype=dtype),
            "k_proj": init_dense(ks[1], d, d, dtype=dtype),
            "v_proj": init_dense(ks[2], d, d, dtype=dtype),
            "out_proj": init_dense(ks[3], d, d, dtype=dtype),
        },
        "layer_norm2": init_norm(d, dtype),
        "mlp": {
            "fc1": init_dense(ks[4], d, cfg.intermediate_size, dtype=dtype),
            "fc2": init_dense(ks[5], cfg.intermediate_size, d, dtype=dtype),
        },
    }


def init_clip_text(key, cfg: CLIPTextConfig, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_hidden_layers + 3)
    return {
        "text_model": {
            "embeddings": {
                "token_embedding": {
                    "weight": jax.random.normal(ks[0], (cfg.vocab_size, cfg.hidden_size), dtype) * 0.02
                },
                "position_embedding": {
                    "weight": jax.random.normal(ks[1], (cfg.max_position_embeddings, cfg.hidden_size), dtype)
                    * 0.02
                },
            },
            "encoder": {
                "layers": {
                    str(i): _init_layer(ks[2 + i], cfg, dtype)
                    for i in range(cfg.num_hidden_layers)
                }
            },
            "final_layer_norm": init_norm(cfg.hidden_size, dtype),
        }
    }


def _attn(p, x, heads, mask):
    b, s, d = x.shape
    hd = d // heads
    scale = hd**-0.5
    q = dense(p["q_proj"], x).reshape(b, s, heads, hd)
    k = dense(p["k_proj"], x).reshape(b, s, heads, hd)
    v = dense(p["v_proj"], x).reshape(b, s, heads, hd)
    o = dot_product_attention(q, k, v, scale=scale) if mask is None else jax.nn.dot_product_attention(
        q, k, v, scale=scale, is_causal=True
    )
    return dense(p["out_proj"], o.reshape(b, s, d))


def clip_text_apply(params, cfg: CLIPTextConfig, input_ids):
    """input_ids (B, 77) int32 -> (last_hidden_state (B,77,D), pooled (B,D))."""
    tm = params["text_model"]
    act = _act(cfg.hidden_act)
    x = tm["embeddings"]["token_embedding"]["weight"][input_ids]
    x = x + tm["embeddings"]["position_embedding"]["weight"][None, : x.shape[1]]

    for i in sorted(tm["encoder"]["layers"], key=int):
        lp = tm["encoder"]["layers"][i]
        h = layer_norm(lp["layer_norm1"], x, cfg.layer_norm_eps)
        x = x + _attn(lp["self_attn"], h, cfg.num_attention_heads, mask="causal")
        h = layer_norm(lp["layer_norm2"], x, cfg.layer_norm_eps)
        x = x + dense(lp["mlp"]["fc2"], act(dense(lp["mlp"]["fc1"], h)))

    x = layer_norm(tm["final_layer_norm"], x, cfg.layer_norm_eps)
    # pooled = hidden at first EOS token per sequence (transformers semantics)
    is_eos = (input_ids == cfg.eos_token_id).astype(jnp.int32)
    eos_idx = jnp.argmax(is_eos, axis=1)
    pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
    return x, pooled
