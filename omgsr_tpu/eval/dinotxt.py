"""DINOv3-txt: CLIP-style text alignment over a frozen DINOv3 ViT, TPU-native.

Re-owns dinov3/eval/text — dinotxt_model.py (DINOTxt:48-138,
DINOTxtConfig:19-45), vision_tower.py (VisionHead:20-80, VisionTower
:83-165), text_tower.py (TextHead:18-68, TextTower:71-118),
text_transformer.py (TextTransformer:13-69), layers/block.py
CausalSelfAttentionBlock:215-269, clip_loss.py, gram_loss.py, and the
train loop in train_dinotxt.py:67-214 — as pure functions over param
dicts whose key paths mirror the torch state dicts.

TPU-first choices:
- The reference's MemoryEfficientClipLoss is a hand-written NCCL ring
  (send/recv chunk cycling + all_to_all of partial LSEs,
  clip_loss.py:11-160) that exists to avoid materializing the (B_global,
  B_global) logit matrix per rank. Under pjit the SAME math is
  `clip_loss` below on globally-sharded features: XLA shards the logits
  over the data axis and inserts the collectives; the loss value equals
  the reference's -(2*diag - lse_rows - lse_cols).mean()/2 exactly.
- Vision head blocks are the ViT's own SelfAttentionBlock (SwiGLU-64,
  LayerScale 1e-5); they reuse models.dinov3_vit._block with sincos=None
  (no RoPE — vision_tower.py:77 notes RoPE is unused in the head).
- The text transformer is a standard pre-LN causal stack; seq length 77
  makes plain XLA attention optimal (no flash kernel needed).
- Gram regularization samples a STATIC-size patch subset (count fixed at
  trace time from the sampling rate) via jax.random.permutation.

The CLIP BPE tokenizer is data-prep, not model: pass pre-tokenized id
arrays (sot/eot/pad layout as upstream), or use any local HF
CLIPTokenizer via `tokenize_with_hf`.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.configs import DinoV3ViTConfig
from omgsr_tpu.models.dinov3_vit import _block, _init_block, get_intermediate_layers
from omgsr_tpu.models.layers import dense, init_dense, init_norm, layer_norm

__all__ = [
    "TextTransformerConfig",
    "DINOTxtConfig",
    "init_text_transformer",
    "text_transformer_apply",
    "init_dinotxt",
    "dinotxt_encode_image",
    "dinotxt_encode_text",
    "dinotxt_forward",
    "dinotxt_get_logits",
    "clip_loss",
    "dinotxt_gram_loss",
    "make_dinotxt_train_step",
    "make_hf_tokenizer",
    "tokenize_with_hf",
    "port_dinotxt_state",
]


@dataclasses.dataclass(frozen=True)
class TextTransformerConfig:
    """text_transformer.py:14-52 args (the dinotxt base recipe)."""

    context_length: int = 77
    vocab_size: int = 49408
    dim: int = 512
    num_heads: int = 8
    num_layers: int = 12
    ffn_ratio: float = 4.0
    is_causal: bool = True
    ls_init_value: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class DINOTxtConfig:
    """dinotxt_model.py:19-45 (the knobs this stack consumes)."""

    embed_dim: int = 2048
    vision_model_freeze_backbone: bool = True
    vision_model_use_class_token: bool = True
    vision_model_use_patch_tokens: bool = True
    vision_model_num_head_blocks: int = 2
    vision_model_use_linear_projection: bool = True
    vision_model_patch_tokens_pooler_type: str = "mean"
    vision_model_patch_token_layer: int = 1  # 1 = last, 2 = second last, ...
    text_model_freeze_backbone: bool = False
    text_model_num_head_blocks: int = 0
    text_model_head_blocks_is_causal: bool = False
    text_model_tokens_pooler_type: str = "argmax"
    text_model_use_linear_projection: bool = True
    init_logit_scale: float = math.log(1 / 0.07)
    freeze_logit_scale: bool = False


# ---------------------------------------------------------------------------
# causal text transformer (text_transformer.py + layers/block.py:215-269)
# ---------------------------------------------------------------------------


def _init_causal_block(key, dim, num_heads, ffn_ratio, ls_init_value, dtype):
    ks = jax.random.split(key, 4)
    p = {
        "attention_norm": init_norm(dim, dtype),
        "attention": {
            "qkv": init_dense(ks[0], dim, 3 * dim, use_bias=False, dtype=dtype),
            "proj": init_dense(ks[1], dim, dim, dtype=dtype),
        },
        "ffn_norm": init_norm(dim, dtype),
        "feed_forward": {
            "fc1": init_dense(ks[2], dim, int(dim * ffn_ratio), dtype=dtype),
            "fc2": init_dense(ks[3], int(dim * ffn_ratio), dim, dtype=dtype),
        },
    }
    if ls_init_value:
        p["ls1"] = {"gamma": jnp.full((dim,), ls_init_value, dtype)}
        p["ls2"] = {"gamma": jnp.full((dim,), ls_init_value, dtype)}
    return p


def _causal_attention(p, x, num_heads, is_causal):
    b, n, d = x.shape
    qkv = dense(p["qkv"], x).reshape(b, n, 3, num_heads, d // num_heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scale = (d // num_heads) ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    if is_causal:
        mask = jnp.tril(jnp.ones((n, n), bool))
        logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, n, d)
    return dense(p["proj"], out)


def _causal_block_apply(p, x, num_heads, is_causal):
    h = _causal_attention(p["attention"], layer_norm(p["attention_norm"], x), num_heads, is_causal)
    if "ls1" in p:
        h = p["ls1"]["gamma"].astype(x.dtype) * h
    x = x + h
    h = layer_norm(p["ffn_norm"], x)
    h = dense(p["feed_forward"]["fc2"], jax.nn.gelu(dense(p["feed_forward"]["fc1"], h), approximate=False))
    if "ls2" in p:
        h = p["ls2"]["gamma"].astype(x.dtype) * h
    return x + h


def init_text_transformer(key, cfg: TextTransformerConfig, dtype=jnp.float32):
    """Key paths mirror TextTransformer.state_dict(); init follows
    :53-62 (token emb 0.02, pos 0.01, depth-scaled attn/proj/fc)."""
    ks = jax.random.split(key, cfg.num_layers + 3)
    params = {
        "token_embedding": {
            "weight": 0.02 * jax.random.normal(ks[0], (cfg.vocab_size, cfg.dim), dtype)
        },
        "positional_embedding": 0.01
        * jax.random.normal(ks[1], (cfg.context_length, cfg.dim), dtype),
        "blocks": {},
        "ln_final": init_norm(cfg.dim, dtype),
    }
    attn_std = cfg.dim**-0.5
    proj_std = attn_std * (2 * cfg.num_layers) ** -0.5
    fc_std = (2 * cfg.dim) ** -0.5
    for i in range(cfg.num_layers):
        blk = _init_causal_block(
            ks[i + 2], cfg.dim, cfg.num_heads, cfg.ffn_ratio, cfg.ls_init_value, dtype
        )
        kq, kp, kf1, kf2 = jax.random.split(ks[i + 2], 4)
        blk["attention"]["qkv"]["kernel"] = attn_std * jax.random.normal(
            kq, blk["attention"]["qkv"]["kernel"].shape, dtype
        )
        blk["attention"]["proj"]["kernel"] = proj_std * jax.random.normal(
            kp, blk["attention"]["proj"]["kernel"].shape, dtype
        )
        blk["feed_forward"]["fc1"]["kernel"] = fc_std * jax.random.normal(
            kf1, blk["feed_forward"]["fc1"]["kernel"].shape, dtype
        )
        blk["feed_forward"]["fc2"]["kernel"] = proj_std * jax.random.normal(
            kf2, blk["feed_forward"]["fc2"]["kernel"].shape, dtype
        )
        params["blocks"][str(i)] = blk
    return params


def text_transformer_apply(params, cfg: TextTransformerConfig, token_ids):
    """(B, N) int ids -> (B, N, dim) (text_transformer.py:64-69)."""
    n = token_ids.shape[1]
    x = params["token_embedding"]["weight"][token_ids] + params["positional_embedding"][:n]
    for i in range(cfg.num_layers):
        x = _causal_block_apply(params["blocks"][str(i)], x, cfg.num_heads, cfg.is_causal)
    return layer_norm(params["ln_final"], x)


# ---------------------------------------------------------------------------
# heads + DINOTxt (vision_tower.py / text_tower.py / dinotxt_model.py)
# ---------------------------------------------------------------------------


def _head_block_cfg(dim, num_heads):
    # SelfAttentionBlock(ffn_layer=SwiGLUFFN(align 64), init_values=1e-5)
    # (vision_tower.py:36-44) == the ViT block with swiglu64
    return DinoV3ViTConfig(
        embed_dim=dim, num_heads=num_heads, ffn_layer="swiglu64", layerscale_init=1e-5
    )


def init_dinotxt(key, cfg: DINOTxtConfig, vit_cfg: DinoV3ViTConfig, text_cfg: TextTransformerConfig, dtype=jnp.float32):
    """Trainable params: vision head, text backbone + head, logit scale.
    The frozen vision backbone stays a separate tree (threaded into the
    apply fns), mirroring freeze_backbone=True."""
    k_vh, k_vp, k_tb, k_th, k_tp = jax.random.split(key, 5)
    vis_mult = 2 if cfg.vision_model_use_class_token and cfg.vision_model_use_patch_tokens else 1
    assert cfg.embed_dim % vis_mult == 0
    visual = {"head": {}}
    if cfg.vision_model_num_head_blocks > 0:
        bcfg = _head_block_cfg(vit_cfg.embed_dim, vit_cfg.num_heads)
        visual["head"]["blocks"] = {
            str(i): _init_block(jax.random.fold_in(k_vh, i), bcfg, dtype)
            for i in range(cfg.vision_model_num_head_blocks)
        }
        visual["head"]["ln_final"] = init_norm(vit_cfg.embed_dim, dtype)
    if (
        vis_mult * vit_cfg.embed_dim != cfg.embed_dim
        or cfg.vision_model_use_linear_projection
    ):
        visual["head"]["linear_projection"] = {
            "kernel": vit_cfg.embed_dim**-0.5
            * jax.random.normal(k_vp, (vit_cfg.embed_dim, cfg.embed_dim // vis_mult), dtype)
        }
    text = {"backbone": init_text_transformer(k_tb, text_cfg, dtype), "head": {}}
    if cfg.text_model_num_head_blocks > 0:
        text["head"]["blocks"] = {
            str(i): _init_causal_block(
                jax.random.fold_in(k_th, i), text_cfg.dim, text_cfg.num_heads, 4.0, None, dtype
            )
            for i in range(cfg.text_model_num_head_blocks)
        }
        text["head"]["ln_final"] = init_norm(text_cfg.dim, dtype)
    if text_cfg.dim != cfg.embed_dim or cfg.text_model_use_linear_projection:
        text["head"]["linear_projection"] = {
            "kernel": text_cfg.dim**-0.5
            * jax.random.normal(k_tp, (text_cfg.dim, cfg.embed_dim), dtype)
        }
    return {
        "visual_model": visual,
        "text_model": text,
        "logit_scale": jnp.full((1,), cfg.init_logit_scale, dtype),
    }


def _vision_head_apply(head, cfg: DINOTxtConfig, vit_cfg, tokens):
    if "blocks" in head:
        bcfg = _head_block_cfg(vit_cfg.embed_dim, vit_cfg.num_heads)
        for i in range(len(head["blocks"])):
            tokens = _block(head["blocks"][str(i)], tokens, None, 0, bcfg)
        tokens = layer_norm(head["ln_final"], tokens)
    if "linear_projection" in head:
        tokens = tokens @ head["linear_projection"]["kernel"].astype(tokens.dtype)
    return tokens


def dinotxt_encode_image(params, cfg: DINOTxtConfig, vit_cfg, backbone_params, images, normalize=False):
    """VisionTower.forward (vision_tower.py:125-165): frozen backbone
    intermediate layer -> [cls | registers | patches] -> head blocks ->
    projection -> cls feature (+ pooled patch features). Returns
    (features, head patch tokens, backbone patch tokens)."""
    bb = jax.lax.stop_gradient(backbone_params) if cfg.vision_model_freeze_backbone else backbone_params
    outs = get_intermediate_layers(
        bb, vit_cfg, images,
        n=cfg.vision_model_patch_token_layer,
        return_class_token=True, return_extra_tokens=True,
    )
    patch_tokens, _, registers = outs[0]
    class_token = outs[-1][1]  # last layer's cls (vision_tower.py:132)
    tokens = jnp.concatenate([class_token[:, None], registers, patch_tokens], axis=1)
    tokens = _vision_head_apply(params["visual_model"]["head"], cfg, vit_cfg, tokens)
    n_reg = registers.shape[1]
    cls_feat = tokens[:, 0]
    head_patches = tokens[:, n_reg + 1 :]
    feats = []
    if cfg.vision_model_use_class_token:
        feats.append(cls_feat)
    if cfg.vision_model_use_patch_tokens:
        if cfg.vision_model_patch_tokens_pooler_type == "mean":
            feats.append(jnp.mean(head_patches, axis=1))
        elif cfg.vision_model_patch_tokens_pooler_type == "max":
            feats.append(jnp.max(head_patches, axis=1))
        else:
            raise ValueError(cfg.vision_model_patch_tokens_pooler_type)
    features = jnp.concatenate(feats, axis=-1)
    if normalize:
        features = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    return features, head_patches, patch_tokens


def dinotxt_encode_text(params, cfg: DINOTxtConfig, text_cfg, token_ids, normalize=False):
    """TextTower.forward (text_tower.py:104-118)."""
    x = text_transformer_apply(params["text_model"]["backbone"], text_cfg, token_ids)
    head = params["text_model"]["head"]
    if "blocks" in head:
        for i in range(len(head["blocks"])):
            x = _causal_block_apply(
                head["blocks"][str(i)], x, text_cfg.num_heads,
                cfg.text_model_head_blocks_is_causal,
            )
        x = layer_norm(head["ln_final"], x)
    if "linear_projection" in head:
        x = x @ head["linear_projection"]["kernel"].astype(x.dtype)
    pool = cfg.text_model_tokens_pooler_type
    if pool == "first":
        feats = x[:, 0]
    elif pool == "last":
        feats = x[:, -1]
    elif pool == "argmax":
        feats = x[jnp.arange(x.shape[0]), jnp.argmax(token_ids, axis=-1)]
    else:
        raise ValueError(pool)
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


def dinotxt_forward(params, cfg, vit_cfg, text_cfg, backbone_params, images, token_ids):
    """DINOTxt.forward (dinotxt_model.py:120-138)."""
    text_features = dinotxt_encode_text(params, cfg, text_cfg, token_ids, normalize=True)
    image_features, head_patches, bb_patches = dinotxt_encode_image(
        params, cfg, vit_cfg, backbone_params, images, normalize=True
    )
    return image_features, text_features, jnp.exp(params["logit_scale"]), head_patches, bb_patches


def dinotxt_get_logits(params, cfg, vit_cfg, text_cfg, backbone_params, images, token_ids):
    """DINOTxt.get_logits (dinotxt_model.py:111-118)."""
    img, txt, scale, _, _ = dinotxt_forward(
        params, cfg, vit_cfg, text_cfg, backbone_params, images, token_ids
    )
    image_logits = scale * img @ txt.T
    return image_logits, image_logits.T


# ---------------------------------------------------------------------------
# losses (clip_loss.py / gram_loss.py)
# ---------------------------------------------------------------------------


def clip_loss(image_features, text_features, logit_scale, axis_name=None):
    """Symmetric InfoNCE == MemoryEfficientClipLoss.forward's value
    (clip_loss.py:118-121): -(2*diag - row_lse - col_lse).mean()/2 over
    L2-normalized global features. Under pjit just call it on sharded
    features; `axis_name` enables the shard_map/pmap form (all_gather of
    both sides, loss on the global matrix — XLA streams the tiles)."""
    if axis_name is not None:
        image_features = jax.lax.all_gather(image_features, axis_name, tiled=True)
        text_features = jax.lax.all_gather(text_features, axis_name, tiled=True)
    logits = logit_scale * image_features.astype(jnp.float32) @ text_features.astype(jnp.float32).T
    pos = jnp.diagonal(logits)
    lse_i = jax.scipy.special.logsumexp(logits, axis=1)
    lse_t = jax.scipy.special.logsumexp(logits, axis=0)
    return -(2.0 * pos - lse_i - lse_t).mean() / 2.0


def dinotxt_gram_loss(backbone_patch_tokens, patch_tokens, key, patch_sampling_rate=1.0, normalize=True):
    """gram_loss.py:10-26: MSE between the head patch Gram and the frozen
    backbone patch Gram over a (static-size) random patch subset."""
    n = patch_tokens.shape[1]
    m = max(int(n * patch_sampling_rate), 1)
    idx = jax.random.permutation(key, n)[:m]
    pt = patch_tokens[:, idx].astype(jnp.float32)
    bt = backbone_patch_tokens[:, idx].astype(jnp.float32)
    if normalize:
        pt = pt / jnp.linalg.norm(pt, axis=-1, keepdims=True)
        bt = bt / jnp.linalg.norm(bt, axis=-1, keepdims=True)
    return jnp.mean((pt @ pt.transpose(0, 2, 1) - bt @ bt.transpose(0, 2, 1)) ** 2)


def make_dinotxt_train_step(
    tx,
    *,
    cfg: DINOTxtConfig,
    vit_cfg,
    text_cfg,
    use_gram_loss: bool = False,
    patch_sampling_rate: float = 0.5,
    normalize_patch_tokens: bool = False,
    gram_loss_weight: float = 1.0,
    axis_name=None,
):
    """train_dinotxt.py:164-214 as one jittable step: contrastive (+gram)
    loss -> grads on the trainable tree -> optimizer. The frozen vision
    backbone is threaded, never updated; lr arrives via the optax
    inject_hyperparams convention used across this repo."""

    def step(params, opt_state, backbone_params, images, token_ids, *, lr, key=None):
        def loss_fn(p):
            img, txt, scale, head_patches, bb_patches = dinotxt_forward(
                p, cfg, vit_cfg, text_cfg, backbone_params, images, token_ids
            )
            contrastive = clip_loss(img, txt, scale[0], axis_name=axis_name)
            total = contrastive
            metrics = {"contrastive_loss": contrastive}
            if use_gram_loss:
                g = dinotxt_gram_loss(
                    bb_patches, head_patches, key,
                    patch_sampling_rate, normalize_patch_tokens,
                )
                total = total + gram_loss_weight * g
                metrics["gram_loss"] = g
            metrics["total_loss"] = total
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        if cfg.freeze_logit_scale:
            grads["logit_scale"] = jnp.zeros_like(grads["logit_scale"])
        if hasattr(opt_state, "hyperparams"):
            opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda a, u: a + u, params, updates)
        # OpenCLIP clamp to [0, ln(100)] after every step
        # (train_dinotxt.py:205-208)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0, math.log(100.0))
        metrics["logit_scale"] = jnp.exp(params["logit_scale"][0])
        return params, opt_state, metrics

    return step


def make_hf_tokenizer(tokenizer_dir: str, context_length: int = 77):
    """Load a LOCAL HF CLIPTokenizer (vocab.json + merges.txt) once and
    return a texts -> (N, context_length) id-array callable matching the
    upstream sot/eot/pad layout (tokenizer.py:16-46). The reference's
    bundled SimpleTokenizer BPE is equivalent data-prep."""
    from transformers import CLIPTokenizer

    tok = CLIPTokenizer.from_pretrained(tokenizer_dir)

    def tokenize(texts):
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int64)
        for i, t in enumerate(texts):
            ids = (
                [tok.bos_token_id]
                + tok.encode(t, add_special_tokens=False)
                + [tok.eos_token_id]
            )
            if len(ids) > context_length:
                ids = ids[:context_length]
                ids[-1] = tok.eos_token_id
            out[i, : len(ids)] = ids
        return out

    return tokenize


def tokenize_with_hf(tokenizer_dir: str, texts, context_length: int = 77):
    """One-shot form of `make_hf_tokenizer` (loads the tokenizer per call)."""
    return make_hf_tokenizer(tokenizer_dir, context_length)(texts)


def port_dinotxt_state(state_dict, dtype=jnp.float32):
    """torch DINOTxt state dict -> the init_dinotxt tree (trainable part).

    Accepts the hub "vision_head_and_text_encoder" checkpoint layout
    (hub/dinotxt.py:74-83, loaded with strict=False): visual_model.head.*,
    text_model.{backbone,head}.*, logit_scale. Any visual_model.backbone.*
    keys are skipped — the frozen vision backbone is its own tree
    (convert.port_dinov3_vit). Linears (O, I) -> kernel (I, O); 1-D norm
    weight -> scale; token embedding / positional embedding kept as-is;
    the scalar-or-(1,) logit_scale lands as shape (1,)."""
    out: dict = {}
    for name, t in state_dict.items():
        if name.startswith("visual_model.backbone."):
            continue
        arr = np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t
        ).astype(np.float32)
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if parts[-2] == "token_embedding":
                key = "weight"
            elif arr.ndim == 2:
                key, arr = "kernel", arr.T
            else:
                key = "scale"
        elif leaf in ("bias", "gamma", "positional_embedding"):
            key = leaf
        elif leaf == "logit_scale":
            out["logit_scale"] = jnp.asarray(arr.reshape(1), dtype)
            continue
        else:
            continue  # logit_bias (hub config: None), buffers
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[key] = jnp.asarray(arr, dtype)
    return out
