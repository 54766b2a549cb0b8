"""Prompt encoding for the CLIs.

Tokenizers load from the local checkpoint dir (transformers tokenizer
classes work offline with on-disk vocab files); text towers are this
framework's JAX models fed by the porters. Both CLIs also accept
pre-computed embeddings (.npz) — the reference's fixed_prompt_path escape
hatch (train/train_omgsr_s.py:200-201, train/train_omgsr_f.py:255-257).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def encode_prompt_sd(sd_path: str, prompt: str, dtype=jnp.float32):
    """CLIP ViT-H embedding (1, 77, 1024) for OMGSR-S
    (infer/infer_omgsr_s.py:24-42 capability)."""
    from transformers import CLIPTokenizer

    from omgsr_tpu.convert import port_clip_text
    from omgsr_tpu.models.clip_text import clip_text_apply
    from omgsr_tpu.models.configs import SD21_CLIP

    tokenizer = CLIPTokenizer.from_pretrained(os.path.join(sd_path, "tokenizer"))
    ids = tokenizer(
        prompt, max_length=tokenizer.model_max_length, padding="max_length",
        truncation=True, return_tensors="np",
    ).input_ids
    params = port_clip_text(os.path.join(sd_path, "text_encoder"))
    hidden, _ = clip_text_apply(params, SD21_CLIP, jnp.asarray(ids))
    return hidden.astype(dtype)


def encode_prompt_flux(flux_path: str, prompt: str, max_sequence_length: int = 512, dtype=jnp.bfloat16):
    """(prompt_embeds (1,512,4096) from T5-XXL, pooled (1,768) from CLIP-L,
    txt_ids (512,3)) — FluxPipeline.encode_prompt capability
    (train/train_omgsr_f.py:244-251)."""
    from transformers import CLIPTokenizer, T5TokenizerFast

    from omgsr_tpu.convert import port_clip_text, port_t5_encoder
    from omgsr_tpu.models.clip_text import clip_text_apply
    from omgsr_tpu.models.configs import FLUX_CLIP_L, FLUX_T5_XXL
    from omgsr_tpu.models.t5 import t5_encode

    clip_tok = CLIPTokenizer.from_pretrained(os.path.join(flux_path, "tokenizer"))
    ids = clip_tok(
        prompt, max_length=clip_tok.model_max_length, padding="max_length",
        truncation=True, return_tensors="np",
    ).input_ids
    clip_params = port_clip_text(os.path.join(flux_path, "text_encoder"), cfg=FLUX_CLIP_L)
    _, pooled = clip_text_apply(clip_params, FLUX_CLIP_L, jnp.asarray(ids))

    t5_tok = T5TokenizerFast.from_pretrained(os.path.join(flux_path, "tokenizer_2"))
    enc = t5_tok(
        prompt, max_length=max_sequence_length, padding="max_length",
        truncation=True, return_tensors="np",
    )
    t5_params = port_t5_encoder(os.path.join(flux_path, "text_encoder_2"))
    embeds = t5_encode(t5_params, FLUX_T5_XXL, jnp.asarray(enc.input_ids))

    txt_ids = jnp.zeros((embeds.shape[1], 3), jnp.float32)
    return embeds.astype(dtype), pooled.astype(dtype), txt_ids


def load_prompt_npz(path: str):
    """Pre-computed embeddings: npz with prompt_embeds [, pooled_prompt_embeds,
    text_ids] arrays."""
    data = np.load(path)
    out = {k: jnp.asarray(data[k]) for k in data.files}
    return out
