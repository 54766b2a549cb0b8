"""hub entry points (omgsr_tpu/hub.py) — the reference torch.hub surface
(hubconf.py:6-25 + dinov3/hub/*.py) as functional one-call builders, at tiny
override sizes."""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch

import omgsr_tpu.hub as hub

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"

TINY_VIT = dict(embed_dim=32, depth=4, num_heads=2, patch_size=16)


def test_hubconf_surface_complete():
    """Every name the reference hubconf.py exports exists here."""
    reference_exports = [
        "dinov3_convnext_base", "dinov3_convnext_large", "dinov3_convnext_small",
        "dinov3_convnext_tiny", "dinov3_vit7b16", "dinov3_vitb16",
        "dinov3_vith16plus", "dinov3_vitl16", "dinov3_vitl16plus",
        "dinov3_vits16", "dinov3_vits16plus",
        "dinov3_vit7b16_lc", "dinov3_vit7b16_de",
        "dinov3_vitl16_dinotxt_tet1280d20h24l", "dinov3_vit7b16_ms",
        "dinov3_vit7b16_dd",
    ]
    for name in reference_exports:
        assert hasattr(hub, name), name
        assert name in hub.__all__, name


def test_vit_backbone_builder():
    m = hub.dinov3_vits16(key=jax.random.key(0), **TINY_VIT)
    assert m.cfgs["backbone"].embed_dim == 32
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    out = jax.jit(m.apply)(m.params, x)
    assert out["x_norm_clstoken"].shape == (2, 32)
    assert out["x_norm_patchtokens"].shape == (2, 4, 32)
    feats = m.extras["get_intermediate_layers"](m.params, x, n=2, reshape=True)
    assert len(feats) == 2 and feats[0].shape == (2, 2, 2, 32)
    # full-size entry points resolve to the published architectures
    from omgsr_tpu.models.configs import VIT_SIZES

    assert hub.dinov3_vit7b16.__name__ == "dinov3_vit7b16"
    assert VIT_SIZES["vit7b16"].embed_dim == 4096


def test_backbone_in_memory_state_dict():
    """hub builders accept an already-loaded torch state dict for backbone
    weights (the porters take dicts as well as .pth paths)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from dinov3.models.vision_transformer import DinoVisionTransformer

    torch.manual_seed(0)
    m = DinoVisionTransformer(
        img_size=32, patch_size=16, embed_dim=32, depth=4, num_heads=2,
        n_storage_tokens=4, mask_k_bias=True, layerscale_init=1e-5,
        pos_embed_rope_base=100.0, pos_embed_rope_dtype="fp32",
        norm_layer="layernormbf16",
    )
    m.init_weights()
    with torch.no_grad():
        for blk in m.blocks:
            bm = blk.attn.qkv.bias_mask
            third = bm.numel() // 3
            bm.fill_(1.0)
            bm[third : 2 * third] = 0.0
    hubm = hub.dinov3_vits16(weights=m.state_dict(), **TINY_VIT)
    x = np.random.default_rng(0).standard_normal((1, 32, 32, 3)).astype(np.float32)
    out = hubm.apply(hubm.params, jnp.asarray(x))
    m.eval()
    with torch.no_grad():
        want = m.forward_features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(out["x_norm_clstoken"]), want["x_norm_clstoken"].numpy(),
        rtol=2e-4, atol=2e-5,
    )


def test_convnext_backbone_builder():
    m = hub.dinov3_convnext_tiny(
        key=jax.random.key(0), depths=(1, 1, 1, 1), dims=(8, 12, 16, 24)
    )
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    feats = jax.jit(lambda p, x: m.apply(p, x, num_stages=4))(m.params, x)
    assert [f.shape[-1] for f in feats] == [8, 12, 16, 24]
    assert feats[0].shape == (1, 16, 16, 8)


def test_linear_classifier_builder():
    m = hub.dinov3_vit7b16_lc(
        key=jax.random.key(0), num_classes=11,
        backbone_arch="vits16", backbone_overrides=TINY_VIT,
    )
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    logits = jax.jit(m.apply)(m.params, x)
    assert logits.shape == (2, 11)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # pretrained head path: a torch nn.Linear state dict ports exactly
    torch.manual_seed(0)
    lin = torch.nn.Linear(2 * 32, 11)
    m2 = hub.dinov3_vit7b16_lc(
        key=jax.random.key(0), weights=lin.state_dict(),
        backbone_arch="vits16", backbone_overrides=TINY_VIT,
    )
    np.testing.assert_allclose(
        np.asarray(m2.params["linear_head"]["kernel"]),
        lin.weight.detach().numpy().T, rtol=1e-6,
    )
    logits2 = m2.apply(m2.params, x)
    # same backbone features, explicit head math
    from omgsr_tpu.models.dinov3_vit import dinov3_vit_apply

    f = dinov3_vit_apply(m2.params["backbone"], m2.cfgs["backbone"], x)
    z = np.concatenate(
        [np.asarray(f["x_norm_clstoken"]), np.asarray(f["x_norm_patchtokens"]).mean(1)],
        axis=-1,
    )
    want = z @ lin.weight.detach().numpy().T + lin.bias.detach().numpy()
    np.testing.assert_allclose(np.asarray(logits2), want, rtol=1e-4, atol=1e-5)


def test_depther_builder():
    m = hub.dinov3_vitl16_dd(
        key=jax.random.key(0),
        backbone_overrides=TINY_VIT,
        head_overrides=dict(
            channels=8, post_process_channels=(8, 10, 12, 14),
            n_output_channels=4, n_hidden_channels=4,
        ),
        depth_range=(0.01, 5.0),
    )
    assert m.cfgs["head"].use_batchnorm  # hub config keeps BN on
    assert m.cfgs["head"].readout_type == "ignore"  # use_cls_token=False
    x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
    depth = jax.jit(m.apply)(m.params, x)
    assert depth.ndim == 4 and depth.shape[-1] == 1
    d = np.asarray(depth)
    assert np.isfinite(d).all()
    assert d.min() >= 0.01 - 1e-6 and d.max() <= 5.0 + 1e-6


def test_segmentor_builder():
    m = hub.dinov3_vitl16_ms(
        key=jax.random.key(0),
        hidden_dim=32, num_classes=7,
        backbone_overrides=TINY_VIT,
        adapter_overrides=dict(interaction_indexes=(0, 1, 2, 3)),
        head_overrides=dict(num_queries=5, nheads=4, dim_feedforward=64,
                            enc_layers=2, dec_layers=3),
    )
    assert m.cfgs["adapter"].interaction_indexes == (0, 1, 2, 3)
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    out = jax.jit(m.apply)(m.params, x)
    assert out["pred_logits"].shape == (1, 5, 8)  # num_classes + 1
    assert out["pred_masks"].shape[:2] == (1, 5)
    seg = m.extras["predict"](m.params, x, rescale_to=(64, 64))
    assert seg.shape == (1, 64, 64, 7)  # NHWC class probabilities
    assert bool(jnp.all(jnp.isfinite(seg)))


def test_segmentor_interaction_index_table():
    """The hub builders consume the segmentation suite's single table
    (eval/segmentation/models/__init__.py:14-19) — no duplicate copy."""
    from omgsr_tpu.eval.segmentation import BACKBONE_INTERMEDIATE_LAYERS

    assert tuple(BACKBONE_INTERMEDIATE_LAYERS["dinov3_vitl16"]) == (4, 11, 17, 23)
    assert tuple(BACKBONE_INTERMEDIATE_LAYERS["dinov3_vit7b16"]) == (9, 19, 29, 39)
    assert not hasattr(hub, "_M2F_INTERACTION_INDEXES")


def test_detector_builder():
    m = hub.dinov3_vitl16plus_de(
        key=jax.random.key(0),
        backbone_overrides=TINY_VIT,
        head_overrides=dict(
            num_classes=7, num_queries_one2one=6, num_queries_one2many=10,
            hidden_dim=32, nheads=4, dec_layers=2, dim_feedforward=64,
            decoder_rpe_hidden_dim=16, num_encoder_layers=2, topk=5,
        ),
    )
    assert m.extras["n_windows"] == 2  # detectors.py:85
    dcfg = m.cfgs["detector"]
    assert dcfg.proposal_in_stride == 16
    assert tuple(dcfg.proposal_tgt_strides) == (8, 16, 32, 64)
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    out = jax.jit(m.apply)(m.params, x)
    assert out["scores"].shape == (1, 5)
    assert out["labels"].shape == (1, 5)
    assert out["boxes"].shape == (1, 5, 4)
    for v in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(v.astype(jnp.float32))))


TINY_TEXT = dict(context_length=16, vocab_size=101, dim=32, num_heads=2,
                 num_layers=2, ffn_ratio=2.0)


def test_dinotxt_builder():
    m = hub.dinov3_vitl16_dinotxt_tet1280d20h24l(
        key=jax.random.key(0),
        backbone_overrides=TINY_VIT,
        model_overrides=dict(embed_dim=64),
        text_overrides=TINY_TEXT,
    )
    # hub config: no vision linear projection (64 == 2*32 concat directly)
    assert "linear_projection" not in m.params["model"]["visual_model"]["head"]
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    ids = jax.random.randint(jax.random.key(2), (3, 16), 0, 101)
    img = m.extras["encode_image"](m.params, x)
    txt = m.extras["encode_text"](m.params, ids)
    assert img.shape == (2, 64) and txt.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=-1), 1.0, rtol=1e-5)
    li, lt = m.apply(m.params, x, ids)
    assert li.shape == (2, 3) and lt.shape == (3, 2)


def test_port_dinotxt_state_matches_torch_text_tower():
    """port_dinotxt_state maps a vendored torch TextTower (backbone + head
    with linear projection) + logit_scale into the init_dinotxt layout and
    reproduces encode_text."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from dinov3.eval.text.text_tower import TextTower
    from dinov3.eval.text.text_transformer import TextTransformer

    from omgsr_tpu.eval.dinotxt import (
        DINOTxtConfig,
        TextTransformerConfig,
        dinotxt_encode_text,
        port_dinotxt_state,
    )

    torch.manual_seed(0)
    backbone = TextTransformer(is_causal=True, ls_init_value=None, **TINY_TEXT)
    tower = TextTower(
        backbone=backbone, freeze_backbone=False, embed_dim=24,
        num_head_blocks=0, head_blocks_is_causal=False,
        head_blocks_block_drop_prob=0.0, tokens_pooler_type="argmax",
        use_linear_projection=True,
    )
    tower.init_weights()
    tower.eval()
    sd = {f"text_model.{k}": v for k, v in tower.state_dict().items()}
    sd["logit_scale"] = torch.full((1,), math.log(1 / 0.07))
    params = port_dinotxt_state(sd)
    np.testing.assert_allclose(float(params["logit_scale"][0]), math.log(1 / 0.07))

    cfg = DINOTxtConfig(embed_dim=24, text_model_use_linear_projection=True)
    tcfg = TextTransformerConfig(is_causal=True, ls_init_value=None, **TINY_TEXT)
    ids = np.random.default_rng(0).integers(1, 100, (3, 16))
    with torch.no_grad():
        want = tower(torch.from_numpy(ids)).numpy()
    got = np.asarray(
        dinotxt_encode_text(params, cfg, tcfg, jnp.asarray(ids), normalize=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
