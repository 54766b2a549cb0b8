"""dinotxt (eval/dinotxt.py) vs the ACTUAL vendored torch implementation
(dinov3/eval/text/*), held through ported weights like the ViT tests."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.eval.dinotxt import (
    DINOTxtConfig,
    TextTransformerConfig,
    clip_loss,
    dinotxt_encode_image,
    dinotxt_encode_text,
    dinotxt_forward,
    dinotxt_gram_loss,
    init_dinotxt,
    init_text_transformer,
    make_dinotxt_train_step,
    text_transformer_apply,
)
from omgsr_tpu.models.configs import DinoV3ViTConfig
from omgsr_tpu.models.dinov3_vit import init_dinov3_vit

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"

TEXT_TINY = TextTransformerConfig(
    context_length=16, vocab_size=101, dim=32, num_heads=2, num_layers=2,
    ffn_ratio=2.0, is_causal=True, ls_init_value=None,
)


def _ref_text_transformer(cfg: TextTransformerConfig):
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from dinov3.eval.text.text_transformer import TextTransformer

    torch.manual_seed(0)
    m = TextTransformer(
        context_length=cfg.context_length, vocab_size=cfg.vocab_size, dim=cfg.dim,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers, ffn_ratio=cfg.ffn_ratio,
        is_causal=cfg.is_causal, ls_init_value=cfg.ls_init_value,
    )
    m.init_weights()
    m.eval()
    return m


def _port_text_state(sd):
    """torch TextTransformer/TextHead state dict -> eval/dinotxt tree."""
    out = {}
    for name, t in sd.items():
        arr = t.detach().numpy()
        parts = name.split(".")
        leaf = parts[-1]
        if leaf == "weight":
            if "token_embedding" in name:
                key = "weight"
            elif "norm" in parts[-2] or parts[-2] == "ln_final":
                key = "scale"
            elif arr.ndim == 2:
                key, arr = "kernel", arr.T
            else:
                key = "weight"
        elif leaf == "bias":
            key = "bias"
        elif leaf == "positional_embedding":
            out["positional_embedding"] = jnp.asarray(arr)
            continue
        elif leaf == "gamma":
            key = "gamma"
        else:
            continue
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[key] = jnp.asarray(arr)
    return out


def test_text_transformer_matches_torch():
    ref = _ref_text_transformer(TEXT_TINY)
    params = _port_text_state(ref.state_dict())
    ids = np.random.default_rng(0).integers(0, TEXT_TINY.vocab_size, (3, 16))
    with torch.no_grad():
        out_t = ref(torch.from_numpy(ids)).numpy()
    out_j = np.asarray(text_transformer_apply(params, TEXT_TINY, jnp.asarray(ids)))
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-5)


def test_clip_loss_matches_reference_formula():
    """clip_loss == the reference MemoryEfficientClipLoss value
    (-(2*diag - row_lse - col_lse).mean()/2) and == the naive symmetric CE."""
    rng = np.random.default_rng(1)
    img = rng.standard_normal((6, 8)).astype(np.float32)
    txt = rng.standard_normal((6, 8)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    scale = 20.0
    got = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), scale))
    logits = torch.tensor(scale * img @ txt.T)
    labels = torch.arange(6)
    want = 0.5 * (
        torch.nn.functional.cross_entropy(logits, labels)
        + torch.nn.functional.cross_entropy(logits.T, labels)
    )
    np.testing.assert_allclose(got, float(want), rtol=1e-6)


def test_clip_loss_sharded_equals_replicated():
    """The data-sharded clip_loss (the TPU stand-in for the reference's
    MemoryEfficientClipLoss NCCL ring) equals the single-device value on the
    same global batch — XLA's sharded logit matrix changes nothing."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omgsr_tpu.parallel import create_mesh

    rng = np.random.default_rng(5)
    img = rng.standard_normal((8, 16)).astype(np.float32)
    txt = rng.standard_normal((8, 16)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    want = float(clip_loss(jnp.asarray(img), jnp.asarray(txt), 10.0))
    mesh = create_mesh({"data": len(jax.devices())})
    sh = NamedSharding(mesh, P("data"))
    got = float(
        jax.jit(clip_loss)(
            jax.device_put(jnp.asarray(img), sh),
            jax.device_put(jnp.asarray(txt), sh),
            10.0,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gram_loss_matches_torch_full_rate():
    """At sampling rate 1.0 (no subset randomness) the losses agree."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from dinov3.eval.text.gram_loss import gram_loss_fn

    rng = np.random.default_rng(2)
    bb = rng.standard_normal((2, 9, 16)).astype(np.float32)
    pt = rng.standard_normal((2, 9, 16)).astype(np.float32)
    for normalize in (True, False):
        got = float(
            dinotxt_gram_loss(
                jnp.asarray(bb), jnp.asarray(pt), jax.random.key(0), 1.0, normalize
            )
        )
        want = float(
            gram_loss_fn(torch.from_numpy(bb), torch.from_numpy(pt), 1.0, normalize)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


VIT_TINY = DinoV3ViTConfig(embed_dim=32, depth=3, num_heads=2, patch_size=8)
DTX = DINOTxtConfig(
    embed_dim=24,
    vision_model_num_head_blocks=1,
    vision_model_use_patch_tokens=True,
    text_model_num_head_blocks=1,
    text_model_tokens_pooler_type="argmax",
)


def _tiny_model():
    bb = init_dinov3_vit(jax.random.key(0), VIT_TINY)
    params = init_dinotxt(jax.random.key(1), DTX, VIT_TINY, TEXT_TINY)
    return bb, params


def test_dinotxt_forward_shapes_and_normalization():
    bb, params = _tiny_model()
    images = jax.random.normal(jax.random.key(2), (2, 32, 32, 3))
    ids = jax.random.randint(jax.random.key(3), (2, 16), 0, TEXT_TINY.vocab_size)
    img_f, txt_f, scale, head_patches, bb_patches = jax.jit(
        lambda p, b, x, t: dinotxt_forward(p, DTX, VIT_TINY, TEXT_TINY, b, x, t)
    )(params, bb, images, ids)
    assert img_f.shape == (2, DTX.embed_dim)
    assert txt_f.shape == (2, DTX.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img_f), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt_f), axis=-1), 1.0, rtol=1e-5)
    assert head_patches.shape == (2, 16, DTX.embed_dim // 2)
    assert bb_patches.shape == (2, 16, VIT_TINY.embed_dim)
    assert float(scale[0]) == pytest.approx(np.exp(np.log(1 / 0.07)), rel=1e-5)


def test_dinotxt_train_step_moves_heads_not_backbone():
    import optax

    bb, params = _tiny_model()
    tx = optax.inject_hyperparams(
        lambda learning_rate: optax.adamw(learning_rate)
    )(learning_rate=0.0)
    opt_state = tx.init(params)
    step = jax.jit(
        make_dinotxt_train_step(
            tx, cfg=DTX, vit_cfg=VIT_TINY, text_cfg=TEXT_TINY,
            use_gram_loss=True, patch_sampling_rate=0.5,
        )
    )
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, TEXT_TINY.vocab_size, (4, 16)))
    bb0 = jax.tree.map(np.asarray, bb)
    p0 = params
    for i in range(2):
        params, opt_state, metrics = step(
            params, opt_state, bb, images, ids, lr=1e-3, key=jax.random.key(i)
        )
    for k in ("contrastive_loss", "gram_loss", "total_loss"):
        assert np.isfinite(float(metrics[k])), k
    # heads and text backbone moved
    assert not np.allclose(
        np.asarray(params["text_model"]["backbone"]["token_embedding"]["weight"]),
        np.asarray(p0["text_model"]["backbone"]["token_embedding"]["weight"]),
    )
    assert not np.allclose(
        np.asarray(params["visual_model"]["head"]["linear_projection"]["kernel"]),
        np.asarray(p0["visual_model"]["head"]["linear_projection"]["kernel"]),
    )
    assert not np.allclose(
        np.asarray(params["logit_scale"]), np.asarray(p0["logit_scale"])
    )
    # frozen vision backbone untouched (stop_gradient + not in the tree)
    np.testing.assert_array_equal(
        np.asarray(bb["cls_token"]), bb0["cls_token"]
    )


def test_encode_text_poolers():
    bb, params = _tiny_model()
    ids = np.zeros((2, 16), np.int64)
    ids[0, :5] = [3, 7, 100, 0, 0][:5]  # argmax -> position of 100 (id max)
    ids[1, :3] = [3, 100, 9]
    import dataclasses as dc

    feats_argmax = dinotxt_encode_text(params, DTX, TEXT_TINY, jnp.asarray(ids))
    cfg_first = dc.replace(DTX, text_model_tokens_pooler_type="first")
    feats_first = dinotxt_encode_text(params, cfg_first, TEXT_TINY, jnp.asarray(ids))
    assert feats_argmax.shape == feats_first.shape == (2, DTX.embed_dim)
    assert not np.allclose(np.asarray(feats_argmax), np.asarray(feats_first))


def test_dinotxt_composed_matches_torch():
    """FULL DINOTxt parity on shared weights: vendored torch DINOTxt
    (vision tower w/ head block + projection over a real DinoVisionTransformer,
    text tower, logit scale) vs dinotxt_encode_image/encode_text/get_logits
    through port_dinov3_vit + port_dinotxt_state. patch_token_layer=2
    exercises the non-last-layer patch-token path (vision_tower.py:127-137)."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from dinov3.eval.text.dinotxt_model import DINOTxt
    from dinov3.eval.text.dinotxt_model import DINOTxtConfig as RefDTXCfg
    from dinov3.eval.text.text_transformer import TextTransformer
    from dinov3.models.vision_transformer import DinoVisionTransformer

    from omgsr_tpu.convert.porters import port_dinov3_vit
    from omgsr_tpu.eval.dinotxt import (
        dinotxt_encode_image,
        dinotxt_get_logits,
        port_dinotxt_state,
    )

    torch.manual_seed(11)
    vb = DinoVisionTransformer(
        img_size=32, patch_size=8, embed_dim=32, depth=3, num_heads=2,
        n_storage_tokens=2, mask_k_bias=True, layerscale_init=1e-5,
        pos_embed_rope_base=100.0, pos_embed_rope_dtype="fp32",
        norm_layer="layernormbf16",
    )
    tb = TextTransformer(
        is_causal=True, ls_init_value=None,
        context_length=TEXT_TINY.context_length, vocab_size=TEXT_TINY.vocab_size,
        dim=TEXT_TINY.dim, num_heads=TEXT_TINY.num_heads,
        num_layers=TEXT_TINY.num_layers, ffn_ratio=TEXT_TINY.ffn_ratio,
    )
    ref_cfg = RefDTXCfg(
        embed_dim=24,
        vision_model_use_class_token=True,
        vision_model_use_patch_tokens=True,
        vision_model_num_head_blocks=1,
        vision_model_use_linear_projection=True,
        vision_model_patch_tokens_pooler_type="mean",
        vision_model_patch_token_layer=2,
        text_model_num_head_blocks=0,
        text_model_tokens_pooler_type="argmax",
        text_model_use_linear_projection=True,
    )
    model = DINOTxt(model_config=ref_cfg, vision_backbone=vb, text_backbone=tb)
    model.init_weights()
    with torch.no_grad():
        for blk in vb.blocks:
            bm = blk.attn.qkv.bias_mask
            third = bm.numel() // 3
            bm.fill_(1.0)
            bm[third : 2 * third] = 0.0
    model.eval()

    sd = model.state_dict()
    vit_cfg = DinoV3ViTConfig(
        embed_dim=32, depth=3, num_heads=2, patch_size=8, n_storage_tokens=2
    )
    bb = port_dinov3_vit(
        {k[len("visual_model.backbone."):]: v for k, v in sd.items()
         if k.startswith("visual_model.backbone.")},
        cfg=vit_cfg,
    )
    params = port_dinotxt_state(sd)
    cfg = DINOTxtConfig(
        embed_dim=24,
        vision_model_num_head_blocks=1,
        vision_model_use_patch_tokens=True,
        vision_model_use_linear_projection=True,
        vision_model_patch_token_layer=2,
        text_model_num_head_blocks=0,
        text_model_tokens_pooler_type="argmax",
        text_model_use_linear_projection=True,
    )

    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(1, TEXT_TINY.vocab_size - 1, (3, TEXT_TINY.context_length))
    with torch.no_grad():
        want_img = model.encode_image(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), normalize=True
        ).numpy()
        want_txt = model.encode_text(torch.from_numpy(ids), normalize=True).numpy()
        want_li, want_lt = model.get_logits(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(ids)
        )
    got_img = np.asarray(
        dinotxt_encode_image(params, cfg, vit_cfg, bb, jnp.asarray(x), normalize=True)[0]
    )
    got_txt = np.asarray(
        dinotxt_encode_text(params, cfg, TEXT_TINY, jnp.asarray(ids), normalize=True)
    )
    np.testing.assert_allclose(got_img, want_img, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_txt, want_txt, rtol=2e-4, atol=2e-5)
    got_li, got_lt = dinotxt_get_logits(
        params, cfg, vit_cfg, TEXT_TINY, bb, jnp.asarray(x), jnp.asarray(ids)
    )
    np.testing.assert_allclose(np.asarray(got_li), want_li.numpy(), rtol=3e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_lt), want_lt.numpy(), rtol=3e-4, atol=3e-5)
