"""Weight porters: HF checkpoints on disk -> omgsr-tpu param trees.

The reference downloads models through diffusers/transformers from_pretrained
(train/train_omgsr_s.py:215-228 etc.); TPU hosts are zero-egress, so these
porters read local checkpoint dirs (HF layout) directly from safetensors —
torch is needed only for the DINOv3 .pth (torch.load on CPU).

Layout conversions:
  * conv   torch OIHW  -> HWIO   (transpose 2,3,1,0)
  * linear torch (O,I) -> (I,O)  (transpose)
  * 1-dim norm weight  -> "scale"
  * embeddings / bias tables kept as-is

Because param-tree paths mirror HF key paths by construction, the mapping is
mechanical; each porter validates leaf-set equality against the model's
init_* structure so a missing/mistyped key fails loudly.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from omgsr_tpu.utils.tree import flatten_dict, unflatten_dict


def _load_safetensors_file(path):
    # flax framework handles bf16/fp16 natively (returns numpy-compatible
    # ml_dtypes arrays); np framework would choke on bf16 checkpoints (FLUX).
    from safetensors.flax import load_file

    return load_file(path)


def load_safetensors_dir(path: str, subfolder: str | None = None) -> dict:
    """Load all tensors of a (possibly sharded) HF checkpoint dir."""
    if subfolder:
        path = os.path.join(path, subfolder)
    if os.path.isfile(path):
        return _load_safetensors_file(path)
    index = None
    for name in os.listdir(path):
        if name.endswith(".safetensors.index.json"):
            with open(os.path.join(path, name)) as f:
                index = json.load(f)
            break
    tensors = {}
    if index is not None:
        shards = sorted(set(index["weight_map"].values()))
        for s in shards:
            tensors.update(_load_safetensors_file(os.path.join(path, s)))
    else:
        for name in sorted(os.listdir(path)):
            if name.endswith(".safetensors"):
                tensors.update(_load_safetensors_file(os.path.join(path, name)))
    if not tensors:
        raise FileNotFoundError(f"no safetensors found under {path}")
    return tensors


def _convert(tensors: dict, *, keep_2d: tuple = (), skip: tuple = (), dtype=jnp.float32) -> dict:
    """Generic torch->jax layout conversion keyed on tensor rank."""
    flat = {}
    for key, w in tensors.items():
        if any(key.startswith(s) or key == s for s in skip):
            continue
        w = np.asarray(w)
        parts = key.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if any(key.endswith(k) for k in keep_2d):
                path, arr = parts[:-1] + ["weight"], w
            elif w.ndim == 4:
                path, arr = parts[:-1] + ["kernel"], w.transpose(2, 3, 1, 0)
            elif w.ndim == 2:
                path, arr = parts[:-1] + ["kernel"], w.T
            elif w.ndim == 1:
                path, arr = parts[:-1] + ["scale"], w
            else:
                raise ValueError(f"unexpected weight rank {w.ndim} at {key}")
        elif leaf == "bias":
            path, arr = parts, w
        else:  # gamma, etc.
            path, arr = parts, w
        flat[tuple(path)] = jnp.asarray(np.ascontiguousarray(arr), dtype)
    return unflatten_dict(flat)


def _validate_against(params: dict, expected_shapes, name: str):
    """Check leaf paths+shapes match the init structure (jax.eval_shape tree)."""
    got = {p: tuple(v.shape) for p, v in flatten_dict(params).items()}
    want = {p: tuple(v.shape) for p, v in flatten_dict(expected_shapes).items()}
    missing = sorted(set(want) - set(got))[:10]
    extra = sorted(set(got) - set(want))[:10]
    wrong = sorted(p for p in set(got) & set(want) if got[p] != want[p])[:10]
    if missing or extra or wrong:
        raise ValueError(
            f"{name} port mismatch:\n missing={missing}\n extra={extra}\n wrong_shapes="
            + str([(p, got[p], want[p]) for p in wrong])
        )
    return params


def port_diffusers_vae(path: str, cfg=None, dtype=jnp.float32, validate: bool = True):
    """<sd_or_flux_path>/vae -> VAE param tree."""
    import jax

    from omgsr_tpu.models.configs import SD21_VAE
    from omgsr_tpu.models.vae import init_vae

    cfg = cfg or SD21_VAE
    tensors = load_safetensors_dir(path)
    params = _convert(tensors, dtype=dtype)
    if validate:
        expected = jax.eval_shape(lambda k: init_vae(k, cfg), jax.random.key(0))
        _validate_against(params, expected, "vae")
    return params


def port_diffusers_unet(path: str, cfg=None, dtype=jnp.float32, validate: bool = True):
    import jax

    from omgsr_tpu.models.configs import SD21_UNET
    from omgsr_tpu.models.unet_sd import init_unet

    cfg = cfg or SD21_UNET
    tensors = load_safetensors_dir(path)
    params = _convert(tensors, dtype=dtype)
    if validate:
        expected = jax.eval_shape(lambda k: init_unet(k, cfg), jax.random.key(0))
        _validate_against(params, expected, "unet")
    return params


def port_flux_transformer(path: str, cfg=None, dtype=jnp.bfloat16, validate: bool = True):
    import jax

    from omgsr_tpu.models.configs import FLUX_DEV
    from omgsr_tpu.models.flux import init_flux

    cfg = cfg or FLUX_DEV
    tensors = load_safetensors_dir(path)
    params = _convert(tensors, dtype=dtype)
    if validate:
        expected = jax.eval_shape(lambda k: init_flux(k, cfg), jax.random.key(0))
        _validate_against(params, expected, "flux")
    return params


def port_clip_text(path: str, cfg=None, dtype=jnp.float32, validate: bool = True):
    import jax

    from omgsr_tpu.models.clip_text import init_clip_text
    from omgsr_tpu.models.configs import SD21_CLIP

    cfg = cfg or SD21_CLIP
    tensors = load_safetensors_dir(path)
    params = _convert(
        tensors,
        keep_2d=("token_embedding.weight", "position_embedding.weight"),
        skip=("text_model.embeddings.position_ids", "text_projection"),
        dtype=dtype,
    )
    if validate:
        expected = jax.eval_shape(lambda k: init_clip_text(k, cfg), jax.random.key(0))
        _validate_against(params, expected, "clip_text")
    return params


def port_clip_vision(path: str, cfg=None, dtype=jnp.float32, validate: bool = True):
    """HF CLIPVisionModel[WithProjection] / full CLIPModel dir -> vision
    param tree (text tower ignored; visual_projection kept when present)."""
    import jax

    from omgsr_tpu.models.clip_vision import CLIP_L_VISION, init_clip_vision

    cfg = cfg or CLIP_L_VISION
    tensors = load_safetensors_dir(path)
    params = _convert(
        tensors,
        keep_2d=("position_embedding.weight",),
        skip=(
            "text_model", "text_projection", "logit_scale",
            "vision_model.embeddings.position_ids",
        ),
        dtype=dtype,
    )
    if validate:
        expected = jax.eval_shape(
            lambda k: init_clip_vision(
                k, cfg, with_projection="visual_projection" in params
            ),
            jax.random.key(0),
        )
        _validate_against(params, expected, "clip_vision")
    return params


def port_t5_encoder(path: str, cfg=None, dtype=jnp.bfloat16, validate: bool = True):
    import jax

    from omgsr_tpu.models.configs import FLUX_T5_XXL
    from omgsr_tpu.models.t5 import init_t5_encoder

    cfg = cfg or FLUX_T5_XXL
    tensors = load_safetensors_dir(path)
    params = _convert(
        tensors,
        keep_2d=("shared.weight", "relative_attention_bias.weight"),
        skip=("encoder.embed_tokens",),  # alias of shared
        dtype=dtype,
    )
    if validate:
        expected = jax.eval_shape(lambda k: init_t5_encoder(k, cfg), jax.random.key(0))
        _validate_against(params, expected, "t5")
    return params


def port_dinov3_convnext(pth_path: str, cfg=None, dtype=jnp.float32, validate: bool = True):
    """DINOv3 ConvNeXt .pth (torch checkpoint) -> backbone param tree.

    Only the feature-extraction subtree OMGSR touches (downsample_layers +
    stages; dinov3_gan/dinov3_convnext_dists.py:63-70) is ported.
    """
    import jax
    import torch

    from omgsr_tpu.models.configs import CONVNEXT_SIZES
    from omgsr_tpu.models.convnext import init_convnext

    cfg = cfg or CONVNEXT_SIZES["large"]
    # accept an already-loaded state dict too (hub in-memory weights)
    sd = (
        pth_path
        if isinstance(pth_path, dict)
        else torch.load(pth_path, map_location="cpu", weights_only=True)
    )
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    # "norm." (exact prefix) is the model-level final LN; "norms.3.*" is its
    # state-dict alias (norms ModuleList shares the module, convnext.py:188)
    tensors = {
        k: v.float().numpy()
        for k, v in sd.items()
        if k.startswith(("downsample_layers", "stages", "norm."))
    }
    # dwconv is grouped (C,1,7,7) -> (7,7,1,C); generic rule handles it via
    # transpose(2,3,1,0)
    params = _convert(tensors, dtype=dtype)
    if validate:
        expected = jax.eval_shape(
            lambda k: init_convnext(k, cfg, with_final_norm="norm" in params),
            jax.random.key(0),
        )
        _validate_against(params, expected, "dinov3_convnext")
    return params


def port_dinov3_vit(pth_path: str, cfg=None, dtype=jnp.float32, validate: bool = True):
    """DINOv3 ViT hub .pth (torch checkpoint) -> param tree for
    models.dinov3_vit (hub/backbones.py:63-146 load path).

    The reference's LinearKMaskedBias stores a bias_mask buffer alongside the
    qkv bias and multiplies them at every forward (dinov3/layers/
    attention.py:30-40); here the product is folded into the bias once at
    port time. `local_cls_norm` (untie_global_and_local_cls_norm) is a
    train-only head and is dropped (vision_transformer.py:171 "never used
    during eval"); `head` is Identity and stores nothing.
    """
    import jax
    import torch

    from omgsr_tpu.models.configs import VIT_SIZES
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit

    cfg = cfg or VIT_SIZES["vitl16"]
    # accept an already-loaded state dict too (hub in-memory weights)
    sd = (
        pth_path
        if isinstance(pth_path, dict)
        else torch.load(pth_path, map_location="cpu", weights_only=True)
    )
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    tensors = {}
    for k, v in sd.items():
        if k.startswith("local_cls_norm") or k.endswith(".bias_mask"):
            continue
        w = v.float()
        if k.endswith(".bias") and f"{k}_mask" in sd:
            mask = sd[f"{k}_mask"].float()
            if not torch.isfinite(mask).all():
                raise ValueError(
                    f"{k}_mask contains non-finite values (uninitialized "
                    "buffer?) — refusing to fold into the bias"
                )
            w = w * mask
        tensors[k] = w.numpy()
    params = _convert(tensors, dtype=dtype)
    if validate:
        expected = jax.eval_shape(lambda k: init_dinov3_vit(k, cfg), jax.random.key(0))
        _validate_against(params, expected, "dinov3_vit")
    return params
