"""Mask2Former segmentation suite (eval/segmentation.py) vs the ACTUAL
vendored torch implementation, through the production porter — pixel
decoder, masked transformer decoder, deformable attention module, sine
positions, and the full ViT-Adapter over the real vendored ViT."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.eval.segmentation import (
    AdapterConfig,
    M2FConfig,
    adapter_apply,
    init_adapter,
    init_mask2former_head,
    init_msda,
    make_segmentor,
    mask2former_head_apply,
    msda_apply,
    port_m2f_state,
    position_embedding_sine,
    semantic_inference,
    slide_inference,
)
from omgsr_tpu.models.configs import DinoV3ViTConfig
from omgsr_tpu.models.dinov3_vit import init_dinov3_vit

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

# enc_points stays 4: the torch MSDeformAttnTransformerEncoderOnly default
# that MSDeformAttnPixelDecoder does not expose (pixel_decoder.py:99/:309)
TINY_M2F = M2FConfig(
    hidden_dim=32, num_classes=7, num_queries=5, nheads=4,
    dim_feedforward=64, enc_layers=2, dec_layers=3,
)


def _nchw(a):
    return torch.from_numpy(np.asarray(a)).permute(0, 3, 1, 2).contiguous()


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_position_embedding_sine_matches_torch():
    from dinov3.eval.segmentation.models.utils.position_encoding import (
        PositionEmbeddingSine,
    )

    pe = PositionEmbeddingSine(16, normalize=True)
    x = torch.zeros(1, 32, 5, 7)
    want = pe(x).permute(0, 2, 3, 1).reshape(5 * 7, 32).numpy()
    got = position_embedding_sine(5, 7, 16)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_msda_module_matches_torch():
    from dinov3.eval.segmentation.models.utils.ms_deform_attn import MSDeformAttn

    torch.manual_seed(0)
    m = MSDeformAttn(d_model=32, n_levels=2, n_heads=4, n_points=3, ratio=0.5)
    # randomize the zero-init linears so parity is non-trivial
    with torch.no_grad():
        m.sampling_offsets.weight.normal_(0, 0.02)
        m.attention_weights.weight.normal_(0, 0.02)
        m.attention_weights.bias.normal_(0, 0.2)
    m.eval()
    params = port_m2f_state(m.state_dict())
    rng = np.random.default_rng(0)
    shapes = [(4, 6), (2, 3)]
    s_total = sum(h * w for h, w in shapes)
    q, b = 9, 2
    feat = rng.standard_normal((b, s_total, 32)).astype(np.float32)
    refs = rng.uniform(0.1, 0.9, (b, q, 2, 2)).astype(np.float32)
    query = rng.standard_normal((b, q, 32)).astype(np.float32)
    with torch.no_grad():
        want = m(
            torch.from_numpy(query),
            torch.from_numpy(refs),
            torch.from_numpy(feat),
            torch.as_tensor(shapes, dtype=torch.long),
            torch.as_tensor([0, 24], dtype=torch.long),
        ).numpy()
    got = np.asarray(
        msda_apply(
            params, jnp.asarray(query), jnp.asarray(refs), jnp.asarray(feat),
            shapes, n_heads=4, n_points=3, ratio=0.5,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def _torch_pixel_decoder():
    from dinov3.eval.segmentation.models.heads.pixel_decoder import (
        MSDeformAttnPixelDecoder,
    )

    torch.manual_seed(1)
    dec = MSDeformAttnPixelDecoder(
        input_shape={
            "1": [32, 64, 64, 4], "2": [32, 32, 32, 4],
            "3": [32, 16, 16, 4], "4": [32, 8, 8, 4],
        },
        transformer_dropout=0.0,
        transformer_nheads=TINY_M2F.nheads,
        transformer_dim_feedforward=TINY_M2F.dim_feedforward,
        transformer_enc_layers=TINY_M2F.enc_layers,
        conv_dim=TINY_M2F.hidden_dim,
        mask_dim=TINY_M2F.hidden_dim,
        norm="GN",
        transformer_in_features=["1", "2", "3", "4"],
        common_stride=4,
    )
    # tiny GN groups: 32 channels / 32 groups is fine as-is
    dec.eval()
    return dec


def _rand_features(rng, b=1):
    return {
        "1": rng.standard_normal((b, 16, 16, 32)).astype(np.float32),
        "2": rng.standard_normal((b, 8, 8, 32)).astype(np.float32),
        "3": rng.standard_normal((b, 4, 4, 32)).astype(np.float32),
        "4": rng.standard_normal((b, 2, 2, 32)).astype(np.float32),
    }


def test_pixel_decoder_matches_torch():
    from omgsr_tpu.eval.segmentation import _pixel_decoder_apply

    dec = _torch_pixel_decoder()
    params = port_m2f_state(dec.state_dict())
    rng = np.random.default_rng(2)
    feats = _rand_features(rng)
    with torch.no_grad():
        mask_t, top_t, ms_t = dec.forward_features(
            {k: _nchw(v) for k, v in feats.items()}
        )
    mask_j, top_j, ms_j = _pixel_decoder_apply(
        params, TINY_M2F, {k: jnp.asarray(v) for k, v in feats.items()}
    )
    np.testing.assert_allclose(np.asarray(mask_j), _nhwc(mask_t), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(top_j), _nhwc(top_t), rtol=3e-4, atol=3e-5)
    for a, b_ in zip(ms_j, ms_t):
        np.testing.assert_allclose(np.asarray(a), _nhwc(b_), rtol=3e-4, atol=3e-5)


def test_masked_transformer_decoder_matches_torch():
    from dinov3.eval.segmentation.models.heads.mask2former_transformer_decoder import (
        MultiScaleMaskedTransformerDecoder,
    )
    from omgsr_tpu.eval.segmentation import _m2f_predictor_apply

    torch.manual_seed(3)
    dec = MultiScaleMaskedTransformerDecoder(
        in_channels=TINY_M2F.hidden_dim,
        num_classes=TINY_M2F.num_classes,
        hidden_dim=TINY_M2F.hidden_dim,
        num_queries=TINY_M2F.num_queries,
        nheads=TINY_M2F.nheads,
        dim_feedforward=TINY_M2F.dim_feedforward,
        dec_layers=TINY_M2F.dec_layers,
        pre_norm=False,
        mask_dim=TINY_M2F.hidden_dim,
        enforce_input_project=False,
    )
    dec.eval()
    params = port_m2f_state(dec.state_dict())
    rng = np.random.default_rng(4)
    ms = [
        rng.standard_normal((1, 2, 2, 32)).astype(np.float32),
        rng.standard_normal((1, 4, 4, 32)).astype(np.float32),
        rng.standard_normal((1, 8, 8, 32)).astype(np.float32),
    ]
    mask_features = rng.standard_normal((1, 16, 16, 32)).astype(np.float32)
    with torch.no_grad():
        want = dec([_nchw(m) for m in ms], _nchw(mask_features))
    got = _m2f_predictor_apply(
        params, TINY_M2F, [jnp.asarray(m) for m in ms], jnp.asarray(mask_features)
    )
    np.testing.assert_allclose(
        np.asarray(got["pred_logits"]), want["pred_logits"].numpy(), rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["pred_masks"]), want["pred_masks"].numpy(), rtol=3e-4, atol=3e-5
    )


VIT_TINY_KWARGS = dict(
    img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
    pos_embed_rope_dtype="fp32", norm_layer="layernormbf16",
    layerscale_init=1e-5, n_storage_tokens=2, mask_k_bias=True,
)


def _vendored_vit():
    from dinov3.models.vision_transformer import DinoVisionTransformer

    torch.manual_seed(5)
    m = DinoVisionTransformer(**VIT_TINY_KWARGS)
    m.init_weights()
    with torch.no_grad():  # randomize flat init for non-trivial parity
        for name, p in m.named_parameters():
            if p.ndim == 1 or "token" in name:
                p.add_(0.05 * torch.randn_like(p))
        # pretrained checkpoints carry the k-masked bias pattern; the
        # constructor leaves the buffer NaN (attention.py:36)
        for blk in m.blocks:
            bm = blk.attn.qkv.bias_mask
            third = bm.numel() // 3
            bm.fill_(1.0)
            bm[third : 2 * third] = 0.0
    m.eval()
    return m


def test_adapter_matches_torch_full_stack():
    """DINOv3_Adapter over the real vendored ViT vs our adapter over the
    ported ViT — the complete segmentation backbone path."""
    import io

    from dinov3.eval.segmentation.models.backbone.dinov3_adapter import DINOv3_Adapter

    from omgsr_tpu.convert.porters import port_dinov3_vit

    vit_t = _vendored_vit()
    torch.manual_seed(6)
    adapter_t = DINOv3_Adapter(
        vit_t, interaction_indexes=[0, 1, 2, 3], conv_inplane=8,
        deform_num_heads=4, deform_ratio=0.5, with_cp=False,
    )
    adapter_t.eval()

    # port the ViT through the production porter, the adapter via the walker
    buf = io.BytesIO()
    torch.save(vit_t.state_dict(), buf)
    buf.seek(0)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        pth = os.path.join(d, "vit.pth")
        with open(pth, "wb") as f:
            f.write(buf.read())
        vit_cfg = DinoV3ViTConfig(
            embed_dim=32, depth=4, num_heads=2, patch_size=16, n_storage_tokens=2
        )
        bb = port_dinov3_vit(pth, cfg=vit_cfg)

    sd = {k: v for k, v in adapter_t.state_dict().items() if not k.startswith("backbone.")}
    params = port_m2f_state(sd)
    acfg = AdapterConfig(
        interaction_indexes=(0, 1, 2, 3), conv_inplane=8,
        deform_num_heads=4, deform_ratio=0.5,
    )
    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = adapter_t(_nchw(x))
    got = adapter_apply(params, acfg, bb, vit_cfg, jnp.asarray(x))
    for k in ("1", "2", "3", "4"):
        np.testing.assert_allclose(
            np.asarray(got[k]), _nhwc(want[k]), rtol=5e-4, atol=5e-4, err_msg=k
        )


def test_segmentor_end_to_end_and_slide():
    vit_cfg = DinoV3ViTConfig(embed_dim=32, depth=4, num_heads=2, patch_size=16)
    bb = init_dinov3_vit(jax.random.key(0), vit_cfg)
    acfg = AdapterConfig(
        interaction_indexes=(0, 1, 2, 3), conv_inplane=8, deform_num_heads=4
    )
    adapter = init_adapter(jax.random.key(1), vit_cfg, acfg)
    head = init_mask2former_head(jax.random.key(2), TINY_M2F.hidden_dim, TINY_M2F)
    forward, predict = make_segmentor(adapter, head, bb, vit_cfg, acfg, TINY_M2F)

    x = jax.random.normal(jax.random.key(3), (1, 64, 64, 3))
    out = jax.jit(forward)(x)
    assert out["pred_logits"].shape == (1, TINY_M2F.num_queries, TINY_M2F.num_classes + 1)
    assert out["pred_masks"].shape == (1, TINY_M2F.num_queries, 16, 16)
    sem = semantic_inference(out["pred_logits"], out["pred_masks"])
    assert sem.shape == (1, 16, 16, TINY_M2F.num_classes)
    assert bool(jnp.all(jnp.isfinite(sem)))

    # slide over a 96x96 image with 64-crops; overlap averaging stays in [0,1]
    big = jax.random.normal(jax.random.key(4), (1, 96, 96, 3))
    pred = slide_inference(predict, big, crop_size=64, stride=32, n_classes=TINY_M2F.num_classes)
    assert pred.shape == (1, 96, 96, TINY_M2F.num_classes)
    # sum over queries of class-prob x mask-sigmoid: nonnegative, can top 1
    assert np.isfinite(pred).all() and pred.min() >= 0.0
