"""CLIP vision encoder (transformers CLIPVisionModel layout).

Not on the OMGSR execution path (the reference uses only CLIP *text*
towers, train/train_omgsr_s.py:172-199) — this exists for the learned
no-reference IQA metric in the SR-paper eval protocol (CLIP-IQA,
`cli.eval_sr --clipiqa`), where image quality is the softmax over the
cosine similarities of the image embedding against an antonym prompt pair.

Param paths mirror HF keys under vision_model.* (plus the CLIPModel-level
visual_projection when present); convs HWIO, activations NHWC, same
transformer block as `models.clip_text`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from omgsr_tpu.models.clip_text import _act, _attn, _init_layer
from omgsr_tpu.models.layers import dense, init_dense, init_norm, layer_norm

# CLIP image preprocessing constants (OpenAI CLIP normalize)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


# openai/clip-vit-large-patch14 vision tower (the CLIP-L used by FLUX)
CLIP_L_VISION = CLIPVisionConfig()


def init_clip_vision(key, cfg: CLIPVisionConfig, dtype=jnp.float32,
                     with_projection: bool = True):
    d = cfg.hidden_size
    n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
    ks = jax.random.split(key, cfg.num_hidden_layers + 4)
    params = {
        "vision_model": {
            "embeddings": {
                "class_embedding": jax.random.normal(ks[0], (d,), dtype) * 0.02,
                "patch_embedding": {
                    "kernel": jax.random.normal(
                        ks[1], (cfg.patch_size, cfg.patch_size, 3, d), dtype
                    ) * 0.02,
                },
                "position_embedding": {
                    "weight": jax.random.normal(ks[2], (n_pos, d), dtype) * 0.02
                },
            },
            # HF's attribute really is spelled "pre_layrnorm"
            "pre_layrnorm": init_norm(d, dtype),
            "encoder": {
                "layers": {
                    str(i): _init_layer(ks[3 + i], cfg, dtype)
                    for i in range(cfg.num_hidden_layers)
                }
            },
            "post_layernorm": init_norm(d, dtype),
        }
    }
    if with_projection:
        p = init_dense(ks[-1], d, cfg.projection_dim, dtype=dtype)
        params["visual_projection"] = {"kernel": p["kernel"]}  # no bias in HF
    return params


def clip_vision_apply(params, cfg: CLIPVisionConfig, pixel_values):
    """pixel_values (B,H,W,3) CLIP-normalized -> (last_hidden (B,N+1,D),
    pooled (B,D)). Matches HF CLIPVisionTransformer: last_hidden is NOT
    post-layernormed; pooled = post_layernorm(hidden at CLS)."""
    vm = params["vision_model"]
    emb = vm["embeddings"]
    x = jax.lax.conv_general_dilated(
        pixel_values,
        emb["patch_embedding"]["kernel"].astype(pixel_values.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    b = x.shape[0]
    x = x.reshape(b, -1, cfg.hidden_size)
    cls = jnp.broadcast_to(
        emb["class_embedding"].astype(x.dtype)[None, None], (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + emb["position_embedding"]["weight"][None, : x.shape[1]]
    x = layer_norm(vm["pre_layrnorm"], x, cfg.layer_norm_eps)

    act = _act(cfg.hidden_act)
    for i in sorted(vm["encoder"]["layers"], key=int):
        lp = vm["encoder"]["layers"][i]
        h = layer_norm(lp["layer_norm1"], x, cfg.layer_norm_eps)
        x = x + _attn(lp["self_attn"], h, cfg.num_attention_heads, mask=None)
        h = layer_norm(lp["layer_norm2"], x, cfg.layer_norm_eps)
        x = x + dense(lp["mlp"]["fc2"], act(dense(lp["mlp"]["fc1"], h)))

    pooled = layer_norm(vm["post_layernorm"], x[:, 0], cfg.layer_norm_eps)
    return x, pooled


def clip_image_features(params, cfg: CLIPVisionConfig, pixel_values):
    """(B,H,W,3) CLIP-normalized -> projected image embeddings
    (B, projection_dim) — HF CLIPModel.get_image_features."""
    _, pooled = clip_vision_apply(params, cfg, pixel_values)
    return pooled @ params["visual_projection"]["kernel"].astype(pooled.dtype)


def clip_preprocess(rgb01, cfg: CLIPVisionConfig):
    """[0,1] RGB NHWC (any size) -> CLIP-normalized (B,image_size,image_size,3)
    via bicubic resize (torchvision-parity resize from ops.resize)."""
    from omgsr_tpu.ops.resize import resize as _resize

    x = _resize(rgb01, cfg.image_size, cfg.image_size, mode="bicubic")
    x = jnp.clip(x, 0.0, 1.0)
    mean = jnp.asarray(CLIP_IMAGE_MEAN, x.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, x.dtype)
    return (x - mean) / std


def clipiqa_prompt_embeds_from_clip_dir(
    path: str,
    prompts: tuple = ("Good photo.", "Bad photo."),
    input_ids=None,
):
    """Encode the CLIP-IQA antonym prompt pair from a full HF CLIPModel dir
    -> (2, projection_dim) numpy — the `--clipiqa_prompts_npz` payload.

    Uses the ported text tower (`convert.port_clip_text`) plus the
    checkpoint's own text_projection; tokenization comes from the dir's
    tokenizer files via transformers (pass `input_ids` (2, L) to bypass it,
    e.g. when no tokenizer files are on disk)."""
    import json
    import os

    import numpy as np

    from omgsr_tpu.convert.porters import _convert, load_safetensors_dir
    from omgsr_tpu.models.clip_text import clip_text_apply
    from omgsr_tpu.models.configs import CLIPTextConfig

    with open(os.path.join(path, "config.json")) as f:
        top = json.load(f)
    # a full CLIPModel config nests the text tower under "text_config"
    c = top.get("text_config", top)
    cfg = CLIPTextConfig(
        vocab_size=c.get("vocab_size", 49408),
        hidden_size=c.get("hidden_size", 512),
        intermediate_size=c.get("intermediate_size", 2048),
        num_hidden_layers=c.get("num_hidden_layers", 12),
        num_attention_heads=c.get("num_attention_heads", 8),
        max_position_embeddings=c.get("max_position_embeddings", 77),
        hidden_act=c.get("hidden_act", "quick_gelu"),
        layer_norm_eps=c.get("layer_norm_eps", 1e-5),
        eos_token_id=c.get("eos_token_id", 49407),
    )
    tensors = load_safetensors_dir(path)
    if "text_projection.weight" not in tensors:
        raise ValueError(
            f"{path} has no text_projection.weight (CLIP-IQA needs full "
            "CLIPModel weights)"
        )
    proj = np.asarray(tensors["text_projection.weight"], np.float32).T  # (D, P)
    # the dir holds the FULL CLIPModel — convert only the text tower
    params = _convert(
        tensors,
        keep_2d=("token_embedding.weight", "position_embedding.weight"),
        skip=("text_model.embeddings.position_ids", "text_projection",
              "vision_model", "visual_projection", "logit_scale"),
    )
    if input_ids is None:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path)
        input_ids = tok(list(prompts), padding="max_length",
                        max_length=cfg.max_position_embeddings,
                        truncation=True, return_tensors="np")["input_ids"]
    _, pooled = clip_text_apply(params, cfg, jnp.asarray(input_ids, jnp.int32))
    return np.asarray(pooled, np.float32) @ proj


def clipiqa_score_preprocessed(params, cfg: CLIPVisionConfig, pixel_values,
                               prompt_embeds, logit_scale: float = 100.0):
    """CLIP-IQA on already-CLIP-preprocessed (B,S,S,3) pixels — the jittable
    fixed-shape core (jit THIS with params/prompts as args; the resize in
    `clip_preprocess` is shape-dependent and belongs outside the jit)."""
    img = clip_image_features(params, cfg, pixel_values)
    img = img / (jnp.linalg.norm(img, axis=-1, keepdims=True) + 1e-10)
    txt = jnp.asarray(prompt_embeds, img.dtype)
    txt = txt / (jnp.linalg.norm(txt, axis=-1, keepdims=True) + 1e-10)
    logits = logit_scale * img @ txt.T  # (B, 2)
    return jax.nn.softmax(logits, axis=-1)[:, 0]


def clipiqa_score(params, cfg: CLIPVisionConfig, rgb01, prompt_embeds,
                  logit_scale: float = 100.0):
    """CLIP-IQA: softmax over cosine similarities against an antonym prompt
    pair -> probability of the positive prompt, per image (B,).

    prompt_embeds: (2, projection_dim) text embeddings — row 0 the positive
    prompt ("Good photo."), row 1 the negative ("Bad photo.") — precomputed
    (see `clipiqa_prompt_embeds_from_clip_dir`; an .npz hatch keeps this
    weight-free offline, same pattern as cli.prompts).
    """
    return clipiqa_score_preprocessed(
        params, cfg, clip_preprocess(rgb01, cfg), prompt_embeds, logit_scale
    )
