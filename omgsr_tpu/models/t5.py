"""T5 v1.1 encoder (google/t5-v1_1-xxl layout) — FLUX's second text tower.

The reference gets T5-XXL sequence embeddings through
FluxPipeline.encode_prompt (train/train_omgsr_f.py:244-251). Param paths
mirror HF keys under encoder.* plus the shared token embedding.

T5 quirks preserved: RMSNorm without mean-subtraction, no attention scaling
(scale=1.0), relative position bias only in block 0 (shared by all layers),
gated-gelu feed-forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.configs import T5Config
from omgsr_tpu.models.layers import dense, init_dense, init_rms_norm, rms_norm
from omgsr_tpu.ops.attention import dot_product_attention


def _init_block(key, cfg: T5Config, has_rel_bias, dtype):
    inner = cfg.num_heads * cfg.d_kv
    ks = jax.random.split(key, 8)
    attn = {
        "q": init_dense(ks[0], cfg.d_model, inner, use_bias=False, dtype=dtype),
        "k": init_dense(ks[1], cfg.d_model, inner, use_bias=False, dtype=dtype),
        "v": init_dense(ks[2], cfg.d_model, inner, use_bias=False, dtype=dtype),
        "o": init_dense(ks[3], inner, cfg.d_model, use_bias=False, dtype=dtype),
    }
    if has_rel_bias:
        attn["relative_attention_bias"] = {
            "weight": jax.random.normal(ks[7], (cfg.relative_attention_num_buckets, cfg.num_heads), dtype)
            * 0.02
        }
    return {
        "layer": {
            "0": {"SelfAttention": attn, "layer_norm": init_rms_norm(cfg.d_model, dtype)},
            "1": {
                "DenseReluDense": {
                    "wi_0": init_dense(ks[4], cfg.d_model, cfg.d_ff, use_bias=False, dtype=dtype),
                    "wi_1": init_dense(ks[5], cfg.d_model, cfg.d_ff, use_bias=False, dtype=dtype),
                    "wo": init_dense(ks[6], cfg.d_ff, cfg.d_model, use_bias=False, dtype=dtype),
                },
                "layer_norm": init_rms_norm(cfg.d_model, dtype),
            },
        }
    }


def init_t5_encoder(key, cfg: T5Config, dtype=jnp.float32):
    ks = jax.random.split(key, cfg.num_layers + 2)
    return {
        "shared": {"weight": jax.random.normal(ks[0], (cfg.vocab_size, cfg.d_model), dtype) * 1.0},
        "encoder": {
            "block": {
                str(i): _init_block(ks[1 + i], cfg, i == 0, dtype) for i in range(cfg.num_layers)
            },
            "final_layer_norm": init_rms_norm(cfg.d_model, dtype),
        },
    }


def _relative_position_bucket(relative_position, num_buckets=32, max_distance=128):
    """Bidirectional T5 bucketing (transformers T5Attention semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(np.int64) * num_buckets
    n = np.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(n.clip(min=1) / max_exact) / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    return ret + np.where(is_small, n, val_large)


def t5_position_bias(params, cfg: T5Config, seq_len: int) -> jnp.ndarray:
    """(1, heads, q_len, k_len) additive attention bias from block-0 table."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
    )
    table = params["encoder"]["block"]["0"]["layer"]["0"]["SelfAttention"]["relative_attention_bias"]["weight"]
    bias = table[jnp.asarray(buckets)]  # (q, k, heads)
    return bias.transpose(2, 0, 1)[None]


def t5_encode(params, cfg: T5Config, input_ids, attention_mask=None):
    """input_ids (B, S) -> encoder hidden states (B, S, d_model)."""
    x = params["shared"]["weight"][input_ids]
    bias = t5_position_bias(params, cfg, x.shape[1]).astype(jnp.float32)
    if attention_mask is not None:
        big_neg = jnp.finfo(jnp.float32).min
        bias = bias + jnp.where(attention_mask[:, None, None, :] > 0, 0.0, big_neg)

    inner = cfg.num_heads * cfg.d_kv
    for i in sorted(params["encoder"]["block"], key=int):
        blk = params["encoder"]["block"][i]["layer"]
        ap = blk["0"]["SelfAttention"]
        h = rms_norm(blk["0"]["layer_norm"], x, cfg.layer_norm_epsilon)
        b, s, _ = h.shape
        q = dense(ap["q"], h).reshape(b, s, cfg.num_heads, cfg.d_kv)
        k = dense(ap["k"], h).reshape(b, s, cfg.num_heads, cfg.d_kv)
        v = dense(ap["v"], h).reshape(b, s, cfg.num_heads, cfg.d_kv)
        # T5: no 1/sqrt(d) scaling; bias layout (B,H,Q,K) -> jax.nn expects (B,H,Q,K)
        o = dot_product_attention(q, k, v, scale=1.0, bias=bias)
        x = x + dense(ap["o"], o.reshape(b, s, inner))

        fp = blk["1"]["DenseReluDense"]
        h = rms_norm(blk["1"]["layer_norm"], x, cfg.layer_norm_epsilon)
        h = jax.nn.gelu(dense(fp["wi_0"], h), approximate=True) * dense(fp["wi_1"], h)
        x = x + dense(fp["wo"], h)

    return rms_norm(params["encoder"]["final_layer_norm"], x, cfg.layer_norm_epsilon)
