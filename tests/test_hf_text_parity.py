"""Text-tower parity vs the ACTUAL HuggingFace transformers implementations.

transformers is installed (no weights needed — tiny random-init configs);
the HF state dicts flow through this framework's real porter conversion
(`convert.porters._convert`), so both the weight mapping and the model math
are validated against the upstream reference implementation itself."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from omgsr_tpu.convert.porters import _convert
from omgsr_tpu.models.clip_text import clip_text_apply
from omgsr_tpu.models.configs import CLIPTextConfig, T5Config
from omgsr_tpu.models.t5 import t5_encode


def test_clip_text_matches_transformers():
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel

    hf_cfg = HFCfg(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="gelu",
        bos_token_id=98, eos_token_id=99,
    )
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in model.state_dict().items()}
    params = _convert(
        tensors,
        keep_2d=("token_embedding.weight", "position_embedding.weight"),
        skip=("text_model.embeddings.position_ids",),
    )

    cfg = CLIPTextConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, hidden_act="gelu",
        eos_token_id=99,
    )
    ids = np.array([[5, 7, 10, 99, 0, 0], [3, 99, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        out = model(torch.from_numpy(ids))
    hidden, pooled = clip_text_apply(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4
    )


def test_clip_quick_gelu_variant_matches_transformers():
    from transformers import CLIPTextConfig as HFCfg
    from transformers import CLIPTextModel

    hf_cfg = HFCfg(
        vocab_size=60, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu",
        bos_token_id=58, eos_token_id=59,
    )
    torch.manual_seed(1)
    model = CLIPTextModel(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in model.state_dict().items()}
    params = _convert(
        tensors,
        keep_2d=("token_embedding.weight", "position_embedding.weight"),
        skip=("text_model.embeddings.position_ids",),
    )
    cfg = CLIPTextConfig(
        vocab_size=60, hidden_size=16, intermediate_size=32,
        num_hidden_layers=1, num_attention_heads=2, hidden_act="quick_gelu",
        eos_token_id=59,
    )
    ids = np.array([[4, 6, 59, 0]], np.int64)
    with torch.no_grad():
        out = model(torch.from_numpy(ids))
    hidden, pooled = clip_text_apply(params, cfg, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )


def test_t5_encoder_matches_transformers():
    from transformers import T5Config as HFT5Cfg
    from transformers import T5EncoderModel

    hf_cfg = HFT5Cfg(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, feed_forward_proj="gated-gelu",
        dropout_rate=0.0,
    )
    torch.manual_seed(2)
    model = T5EncoderModel(hf_cfg).eval()
    tensors = {k: v.numpy() for k, v in model.state_dict().items()}
    params = _convert(
        tensors,
        keep_2d=("shared.weight", "relative_attention_bias.weight"),
        skip=("encoder.embed_tokens",),
    )
    cfg = T5Config(
        vocab_size=100, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=20,
    )
    ids = np.array([[5, 9, 14, 1, 0, 0]], np.int64)
    mask = np.array([[1, 1, 1, 1, 0, 0]], np.int64)
    with torch.no_grad():
        out = model(torch.from_numpy(ids), attention_mask=torch.from_numpy(mask))
    ours = t5_encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(
        np.asarray(ours), out.last_hidden_state.numpy(), atol=5e-5, rtol=1e-3
    )
