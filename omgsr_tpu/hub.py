"""One-call model builders mirroring the reference torch.hub entry points.

The reference exports, via torch.hub (`hubconf.py`, dinov3/hub/*.py):
11 backbones (7 ViT + 4 ConvNeXt), a linear classifier (`dinov3_vit7b16_lc`),
a DPT depther (`dinov3_vit7b16_dd`), a Mask2Former segmentor
(`dinov3_vit7b16_ms`), a Plain-DETR detector (`dinov3_vit7b16_de`) and the
DINOTxt text-alignment model (`dinov3_vitl16_dinotxt_tet1280d20h24l`).
This module provides the same entry points (same names, same per-backbone
head configurations) in this framework's functional style, plus the extra
per-backbone variants the hub builders themselves support
(`dinov3_vitl16_dd/_ms`, `dinov3_vitl16plus_de`).

Differences from the torch hub, by design:
- zero-egress: `weights=` / `backbone_weights=` take LOCAL `.pth` paths or
  in-memory torch state dicts (routed through the production porters);
  `None` = random init (the reference's `pretrained=False`).
- each builder returns a `HubModel`: ONE param tree (frozen backbone under
  `params["backbone"]`) plus a jittable `apply(params, x)` — params are jit
  ARGUMENTS, never captured constants.
- per-builder `backbone_overrides` / head-config overrides exist so tiny
  configurations are constructible for tests (the torch hub hardcodes full
  sizes); defaults reproduce the hub configurations exactly.

Reference: hubconf.py:6-25; dinov3/hub/backbones.py:201-616,
classifiers.py:25-120, depthers.py:34-160, segmentors.py:25-88,
detectors.py:40-137, dinotxt.py:22-86.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.configs import (
    CONVNEXT_SIZES,
    VIT_SIZES,
    ConvNeXtConfig,
    DinoV3ViTConfig,
)

__all__ = [
    "HubModel",
    # backbones (hubconf.py:6-18)
    "dinov3_vits16",
    "dinov3_vits16plus",
    "dinov3_vitb16",
    "dinov3_vitl16",
    "dinov3_vitl16plus",
    "dinov3_vith16plus",
    "dinov3_vit7b16",
    "dinov3_convnext_tiny",
    "dinov3_convnext_small",
    "dinov3_convnext_base",
    "dinov3_convnext_large",
    # downstream models (hubconf.py:19-25)
    "dinov3_vit7b16_lc",
    "dinov3_vit7b16_dd",
    "dinov3_vitl16_dd",
    "dinov3_vit7b16_ms",
    "dinov3_vitl16_ms",
    "dinov3_vit7b16_de",
    "dinov3_vitl16plus_de",
    "dinov3_vitl16_dinotxt_tet1280d20h24l",
]


@dataclasses.dataclass
class HubModel:
    """params: full tree (frozen backbone at params['backbone']);
    apply(params, x): the model's main jittable forward;
    cfgs: every config by name; extras: secondary entry points
    (predict / encode_text / tokenize ...)."""

    params: Any
    cfgs: dict
    apply: Callable
    extras: dict = dataclasses.field(default_factory=dict)


def _as_state_dict(weights):
    """LOCAL .pth path or an in-memory state dict -> plain dict."""
    if isinstance(weights, dict):
        sd = weights
    else:
        import torch

        sd = torch.load(weights, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    return sd


def _key(key):
    return key if key is not None else jax.random.key(0)


# ---------------------------------------------------------------------------
# backbones (dinov3/hub/backbones.py:201-616)
# ---------------------------------------------------------------------------


def _vit_backbone(arch, weights, key, dtype, overrides):
    from omgsr_tpu.convert.porters import port_dinov3_vit
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit

    # unknown arch (e.g. "custom") starts from the config defaults —
    # overrides then define the size (test/bring-your-own-architecture hook)
    cfg = VIT_SIZES.get(arch, DinoV3ViTConfig())
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    if weights is not None:
        params = port_dinov3_vit(weights, cfg=cfg, dtype=dtype)
    else:
        params = init_dinov3_vit(_key(key), cfg, dtype)
    return params, cfg


def _make_vit_entry(arch):
    def builder(*, weights=None, key=None, dtype=jnp.float32, **overrides):
        from omgsr_tpu.models.dinov3_vit import dinov3_vit_apply, get_intermediate_layers

        params, cfg = _vit_backbone(arch, weights, key, dtype, overrides)

        def apply(p, x, **kw):
            return dinov3_vit_apply(p["backbone"], cfg, x, **kw)

        def features(p, x, **kw):
            return get_intermediate_layers(p["backbone"], cfg, x, **kw)

        return HubModel(
            params={"backbone": params},
            cfgs={"backbone": cfg},
            apply=apply,
            extras={"get_intermediate_layers": features},
        )

    builder.__name__ = f"dinov3_{arch}"
    builder.__qualname__ = f"dinov3_{arch}"
    builder.__doc__ = (
        f"DINOv3 ViT backbone '{arch}' (dinov3/hub/backbones.py size entry"
        " points). apply(params, x) == forward_features; extras"
        "['get_intermediate_layers'] mirrors the torch method."
    )
    return builder


dinov3_vits16 = _make_vit_entry("vits16")
dinov3_vits16plus = _make_vit_entry("vits16plus")
dinov3_vitb16 = _make_vit_entry("vitb16")
dinov3_vitl16 = _make_vit_entry("vitl16")
dinov3_vitl16plus = _make_vit_entry("vitl16plus")
dinov3_vith16plus = _make_vit_entry("vith16plus")
dinov3_vit7b16 = _make_vit_entry("vit7b16")


def _make_convnext_entry(size):
    def builder(*, weights=None, key=None, dtype=jnp.float32, **overrides):
        from omgsr_tpu.convert.porters import port_dinov3_convnext
        from omgsr_tpu.models.convnext import (
            convnext_features,
            convnext_forward_features,
            init_convnext,
        )

        cfg = CONVNEXT_SIZES[size]
        if overrides:
            cfg = dataclasses.replace(cfg, **overrides)
        if weights is not None:
            params = port_dinov3_convnext(weights, cfg=cfg, dtype=dtype)
        else:
            params = init_convnext(_key(key), cfg, dtype, with_final_norm=True)

        def apply(p, x, num_stages: int = 4):
            return convnext_features(p["backbone"], x, num_stages=num_stages)

        def forward_features(p, x):
            return convnext_forward_features(p["backbone"], x)

        return HubModel(
            params={"backbone": params},
            cfgs={"backbone": cfg},
            apply=apply,
            extras={"forward_features": forward_features},
        )

    builder.__name__ = f"dinov3_convnext_{size}"
    builder.__qualname__ = f"dinov3_convnext_{size}"
    builder.__doc__ = (
        f"DINOv3 ConvNeXt-{size} backbone (dinov3/hub/backbones.py:497-616)."
        " apply(params, x) -> per-stage feature maps."
    )
    return builder


dinov3_convnext_tiny = _make_convnext_entry("tiny")
dinov3_convnext_small = _make_convnext_entry("small")
dinov3_convnext_base = _make_convnext_entry("base")
dinov3_convnext_large = _make_convnext_entry("large")


# ---------------------------------------------------------------------------
# linear classifier (dinov3/hub/classifiers.py:25-120)
# ---------------------------------------------------------------------------


def dinov3_vit7b16_lc(
    *,
    weights=None,
    backbone_weights=None,
    key=None,
    dtype=jnp.float32,
    num_classes: int = 1000,
    backbone_arch: str = "vit7b16",
    backbone_overrides: Optional[dict] = None,
):
    """ImageNet linear classifier over a frozen ViT backbone: logits =
    Linear(cat([cls_token, mean(patch_tokens)])) (classifiers.py:52-70,
    head 2*embed_dim -> 1000 at :26-35)."""
    from omgsr_tpu.models.dinov3_vit import dinov3_vit_apply

    bb, cfg = _vit_backbone(backbone_arch, backbone_weights, key, dtype, backbone_overrides)
    d = 2 * cfg.embed_dim
    if weights is not None:
        sd = _as_state_dict(weights)
        to_np = lambda t: (
            t.detach().float().numpy() if hasattr(t, "detach") else np.asarray(t)
        )
        head = {
            "kernel": jnp.asarray(to_np(sd["weight"]).T, dtype),
            "bias": jnp.asarray(to_np(sd["bias"]), dtype),
        }
    else:
        k = jax.random.fold_in(_key(key), 1)
        head = {
            "kernel": jax.random.normal(k, (d, num_classes), dtype) * d**-0.5,
            "bias": jnp.zeros((num_classes,), dtype),
        }

    def apply(p, x):
        f = dinov3_vit_apply(jax.lax.stop_gradient(p["backbone"]), cfg, x)
        z = jnp.concatenate(
            [f["x_norm_clstoken"], f["x_norm_patchtokens"].mean(axis=1)], axis=-1
        )
        h = p["linear_head"]
        return z @ h["kernel"].astype(z.dtype) + h["bias"].astype(z.dtype)

    return HubModel(
        params={"backbone": bb, "linear_head": head},
        cfgs={"backbone": cfg},
        apply=apply,
    )


# ---------------------------------------------------------------------------
# DPT depthers (dinov3/hub/depthers.py:34-160)
# ---------------------------------------------------------------------------


# hub/depthers.py:53-58 — NOT always embed_dim (ViT-7B: 2048 = width/2)
_DPT_POST_CHANNELS = {"vitl16": 1024, "vit7b16": 2048}


def _make_depther_entry(arch):
    def builder(
        *,
        weights=None,
        backbone_weights=None,
        key=None,
        dtype=jnp.float32,
        depth_range=(0.001, 100.0),  # SYNTHMIX range (depthers.py:27-31)
        backbone_overrides: Optional[dict] = None,
        head_overrides: Optional[dict] = None,
    ):
        from omgsr_tpu.eval.depth import (
            DPTConfig,
            init_dpt_head,
            make_depther,
            port_dpt_state,
        )

        bb, cfg = _vit_backbone(arch, backbone_weights, key, dtype, backbone_overrides)
        # hub head config (depthers.py:34-58): channels 512, post-process
        # channels = embed_dim x4, output 256, batchnorm on, cls token off
        # (readout "ignore"), backbone norm on
        head_cfg = DPTConfig(
            in_channels=(cfg.embed_dim,) * 4,
            channels=512,
            post_process_channels=(_DPT_POST_CHANNELS.get(arch, cfg.embed_dim),) * 4,
            readout_type="ignore",
            n_output_channels=256,
            use_batchnorm=True,
        )
        if head_overrides:
            head_cfg = dataclasses.replace(head_cfg, **head_overrides)
        if weights is not None:
            head = port_dpt_state(_as_state_dict(weights), dtype=dtype)
        else:
            head = init_dpt_head(jax.random.fold_in(_key(key), 1), head_cfg, dtype)
        lo, hi = depth_range

        def apply(p, x):
            fwd = make_depther(
                p["backbone"], cfg, p["head"], head_cfg,
                out_layers="FOUR_EVEN_INTERVALS",  # == hub _get_out_layers
                use_backbone_norm=True,
                min_depth=lo, max_depth=hi,
            )
            return fwd(x)

        return HubModel(
            params={"backbone": bb, "head": head},
            cfgs={"backbone": cfg, "head": head_cfg},
            apply=apply,
        )

    builder.__name__ = f"dinov3_{arch}_dd"
    builder.__qualname__ = f"dinov3_{arch}_dd"
    builder.__doc__ = (
        f"DPT depther over a frozen {arch} backbone with the hub head"
        " configuration (hub/depthers.py:34-58); apply(params, image) ->"
        " (B, H, W, 1) metric depth in depth_range."
    )
    return builder


dinov3_vit7b16_dd = _make_depther_entry("vit7b16")
dinov3_vitl16_dd = _make_depther_entry("vitl16")


# ---------------------------------------------------------------------------
# Mask2Former segmentors (dinov3/hub/segmentors.py:25-88)
# ---------------------------------------------------------------------------

def _even_interval_layers(depth: int):
    """[m * depth//4 - 1 for m in 1..4] — the hub detector's layers_to_use
    default (detectors.py:96-98) and the segmentor fallback for unknown
    arches. NOT the depth suite's table: eval.depth.backbone_out_indices
    ("FOUR_EVEN_INTERVALS") additionally carries the ViT-L [4,11,17,23]
    backward-compat quirk, which the detector deliberately does not."""
    return [m * depth // 4 - 1 for m in range(1, 5)]




def _split_m2f_state(sd):
    """hub m2f checkpoints target the FeatureDecoder: segmentation_model.0
    = DINOv3_Adapter (its nested frozen ViT excluded), segmentation_model.1
    = Mask2FormerHead (segmentors.py:59-64). Bare adapter/head dumps are
    split by their module names."""
    adapter, head = {}, {}
    for k, v in sd.items():
        name = k
        if name.startswith("segmentation_model.0."):
            name = name[len("segmentation_model.0."):]
            dst = adapter
        elif name.startswith("segmentation_model.1."):
            name = name[len("segmentation_model.1."):]
            dst = head
        elif name.split(".", 1)[0] in ("pixel_decoder", "predictor"):
            dst = head
        else:
            dst = adapter
        if name.startswith("backbone."):
            continue  # frozen ViT loads separately
        dst[name] = v
    return adapter, head


def _make_segmentor_entry(arch):
    def builder(
        *,
        weights=None,
        backbone_weights=None,
        key=None,
        dtype=jnp.float32,
        hidden_dim: int = 2048,
        num_classes: int = 150,
        backbone_overrides: Optional[dict] = None,
        adapter_overrides: Optional[dict] = None,
        head_overrides: Optional[dict] = None,
    ):
        from omgsr_tpu.eval.segmentation import (
            AdapterConfig,
            M2FConfig,
            init_adapter,
            init_mask2former_head,
            make_segmentor,
            port_m2f_state,
        )

        # interaction indexes live in ONE table (the segmentation suite's,
        # eval/segmentation/models/__init__.py:14-19); keys there carry the
        # hub's "dinov3_" prefix
        from omgsr_tpu.eval.segmentation import BACKBONE_INTERMEDIATE_LAYERS

        bb, cfg = _vit_backbone(arch, backbone_weights, key, dtype, backbone_overrides)
        idx = tuple(
            BACKBONE_INTERMEDIATE_LAYERS.get(
                f"dinov3_{arch}", _even_interval_layers(cfg.depth)
            )
        )
        acfg = dataclasses.replace(
            AdapterConfig(interaction_indexes=idx), **(adapter_overrides or {})
        )
        mcfg = dataclasses.replace(
            M2FConfig(hidden_dim=hidden_dim, num_classes=num_classes),
            **(head_overrides or {}),
        )
        if weights is not None:
            a_sd, h_sd = _split_m2f_state(_as_state_dict(weights))
            adapter = port_m2f_state(a_sd, dtype=dtype)
            head = port_m2f_state(h_sd, dtype=dtype)
        else:
            adapter = init_adapter(jax.random.fold_in(_key(key), 1), cfg, acfg, dtype)
            # adapter emits embed_dim-channel maps at 4 scales
            # (segmentors.py:60-66 input_shape)
            head = init_mask2former_head(
                jax.random.fold_in(_key(key), 2), cfg.embed_dim, mcfg, dtype
            )

        def apply(p, x):
            fwd, _ = make_segmentor(p["adapter"], p["head"], p["backbone"], cfg, acfg, mcfg)
            return fwd(x)

        def predict(p, x, rescale_to=(512, 512)):
            _, pred = make_segmentor(p["adapter"], p["head"], p["backbone"], cfg, acfg, mcfg)
            return pred(x, rescale_to=rescale_to)

        return HubModel(
            params={"backbone": bb, "adapter": adapter, "head": head},
            cfgs={"backbone": cfg, "adapter": acfg, "head": mcfg},
            apply=apply,
            extras={"predict": predict},
        )

    builder.__name__ = f"dinov3_{arch}_ms"
    builder.__qualname__ = f"dinov3_{arch}_ms"
    builder.__doc__ = (
        f"Mask2Former ADE20K segmentor over a frozen {arch} backbone"
        " (hub/segmentors.py:25-66). apply(params, image) ->"
        " {pred_logits, pred_masks}; extras['predict'] adds the 512-px"
        " resize + semantic inference."
    )
    return builder


dinov3_vit7b16_ms = _make_segmentor_entry("vit7b16")
dinov3_vitl16_ms = _make_segmentor_entry("vitl16")


# ---------------------------------------------------------------------------
# Plain-DETR detectors (dinov3/hub/detectors.py:40-137)
# ---------------------------------------------------------------------------

_DETECTOR_WINDOWS = {"vit7b16": 3, "vitl16plus": 2}  # detectors.py:85


def _make_detector_entry(arch):
    def builder(
        *,
        weights=None,
        backbone_weights=None,
        key=None,
        dtype=jnp.float32,
        backbone_overrides: Optional[dict] = None,
        head_overrides: Optional[dict] = None,
    ):
        from omgsr_tpu.eval.detection import (
            DetectionConfig,
            detection_backbone_features,
            detr_postprocess,
            init_plain_detr,
            plain_detr_apply,
            port_detr_state,
            windowed_backbone_features,
        )

        bb, cfg = _vit_backbone(arch, backbone_weights, key, dtype, backbone_overrides)
        # hub detection_kwargs (detectors.py:49-82) on the published defaults
        dcfg = DetectionConfig(
            num_queries_one2one=1500,
            num_queries_one2many=1500,
            topk=1500,
            hidden_dim=768,
            dim_feedforward=2048,
            proposal_in_stride=cfg.patch_size,
            proposal_tgt_strides=tuple(
                int(m * cfg.patch_size) for m in (0.5, 1, 2, 4)
            ),
        )
        if head_overrides:
            dcfg = dataclasses.replace(dcfg, **head_overrides)
        n_windows = _DETECTOR_WINDOWS.get(arch, 2)
        layers = _even_interval_layers(cfg.depth)  # detectors.py:96-98
        # [global | windows] channel-doubling over the 4-layer concat
        channels = 2 * len(layers) * cfg.embed_dim
        if weights is not None:
            sd = {
                k: v
                for k, v in _as_state_dict(weights).items()
                if not k.startswith("backbone.")
            }
            det = port_detr_state(sd, dcfg, dtype=dtype)
        else:
            det = init_plain_detr(jax.random.fold_in(_key(key), 1), dcfg, channels, dtype)

        def apply(p, x):
            """x: (B, H, W, 3) ImageNet-normalized; returns the postprocessed
            per-image top-k {scores, labels, boxes xyxy} at input scale
            (DetectorWithProcessor.forward, detectors.py:23-37)."""
            feats_fn = lambda img: detection_backbone_features(
                p["backbone"], cfg, img, layers_to_use=layers
            )
            feat = windowed_backbone_features(feats_fn, x, n_windows, cfg.patch_size)
            out = plain_detr_apply(p["detector"], dcfg, feat)
            sizes = jnp.tile(
                jnp.asarray([[x.shape[1], x.shape[2]]], jnp.float32), (x.shape[0], 1)
            )
            # the hub wrapper passes the same sizes twice
            # (DetectorWithProcessor.forward, detectors.py:34-37)
            return detr_postprocess(
                out, sizes, topk=dcfg.topk, reparam=dcfg.reparam,
                original_target_sizes=sizes,
            )

        def forward_raw(p, x):
            feats_fn = lambda img: detection_backbone_features(
                p["backbone"], cfg, img, layers_to_use=layers
            )
            feat = windowed_backbone_features(feats_fn, x, n_windows, cfg.patch_size)
            return plain_detr_apply(p["detector"], dcfg, feat)

        return HubModel(
            params={"backbone": bb, "detector": det},
            cfgs={"backbone": cfg, "detector": dcfg},
            apply=apply,
            extras={"forward_raw": forward_raw, "n_windows": n_windows},
        )

    builder.__name__ = f"dinov3_{arch}_de"
    builder.__qualname__ = f"dinov3_{arch}_de"
    builder.__doc__ = (
        f"Plain-DETR COCO detector over a frozen windowed {arch} backbone"
        " with the hub head configuration (hub/detectors.py:40-117)."
    )
    return builder


dinov3_vit7b16_de = _make_detector_entry("vit7b16")
dinov3_vitl16plus_de = _make_detector_entry("vitl16plus")


# ---------------------------------------------------------------------------
# DINOTxt (dinov3/hub/dinotxt.py:22-86)
# ---------------------------------------------------------------------------


def dinov3_vitl16_dinotxt_tet1280d20h24l(
    *,
    weights=None,
    backbone_weights=None,
    tokenizer_dir: Optional[str] = None,
    key=None,
    dtype=jnp.float32,
    backbone_arch: str = "vitl16",
    backbone_overrides: Optional[dict] = None,
    model_overrides: Optional[dict] = None,
    text_overrides: Optional[dict] = None,
):
    """DINOTxt: text-aligned ViT-L with a 1280-d 20-head 24-layer causal
    text encoder (hub/dinotxt.py:22-86 — note the hub config differs from
    the training default: NO vision linear projection, embed 2048 = the
    cls/patch concat). `weights` takes the vision-head+text-encoder
    checkpoint; `tokenizer_dir` a local HF CLIPTokenizer (the upstream BPE
    layout)."""
    from omgsr_tpu.eval.dinotxt import (
        DINOTxtConfig,
        TextTransformerConfig,
        dinotxt_encode_image,
        dinotxt_encode_text,
        dinotxt_get_logits,
        init_dinotxt,
        make_hf_tokenizer,
        port_dinotxt_state,
    )

    bb, cfg = _vit_backbone(backbone_arch, backbone_weights, key, dtype, backbone_overrides)
    dtx = dataclasses.replace(
        DINOTxtConfig(
            embed_dim=2048,
            vision_model_use_linear_projection=False,  # dinotxt.py:43
        ),
        **(model_overrides or {}),
    )
    text_cfg = dataclasses.replace(
        TextTransformerConfig(dim=1280, num_heads=20, num_layers=24),
        **(text_overrides or {}),
    )
    if weights is not None:
        model = port_dinotxt_state(_as_state_dict(weights), dtype=dtype)
    else:
        model = init_dinotxt(jax.random.fold_in(_key(key), 1), dtx, cfg, text_cfg, dtype)

    def encode_image(p, images, normalize=True):
        # features only — DINOTxt.encode_image (dinotxt_model.py:106-109)
        return dinotxt_encode_image(
            p["model"], dtx, cfg, p["backbone"], images, normalize=normalize
        )[0]

    def encode_text(p, token_ids, normalize=True):
        return dinotxt_encode_text(p["model"], dtx, text_cfg, token_ids, normalize=normalize)

    def apply(p, images, token_ids):
        return dinotxt_get_logits(
            p["model"], dtx, cfg, text_cfg, p["backbone"], images, token_ids
        )

    extras = {"encode_image": encode_image, "encode_text": encode_text}
    if tokenizer_dir:
        extras["tokenize"] = make_hf_tokenizer(tokenizer_dir, text_cfg.context_length)

    return HubModel(
        params={"backbone": bb, "model": model},
        cfgs={"backbone": cfg, "model": dtx, "text": text_cfg},
        apply=apply,
        extras=extras,
    )
