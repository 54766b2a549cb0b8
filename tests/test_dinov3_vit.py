"""DINOv3 ViT parity vs the ACTUAL vendored reference implementation.

Unlike the diffusion models (whose torch reference is a re-implementation,
tests/torch_ref_models.py), the DINOv3 ViT's upstream source ships inside
the reference repo and runs on CPU torch — so these tests hold
models.dinov3_vit to facebookresearch code itself
(dinov3/models/vision_transformer.py), through the production porter
(state_dict -> .pth -> port_dinov3_vit), breaking any correlated-error
loop.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.models.configs import VIT_SIZES, DinoV3ViTConfig
from omgsr_tpu.models.dinov3_vit import (
    dinov3_vit_apply,
    get_intermediate_layers,
    init_dinov3_vit,
    vit_features,
)

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"

TINY = dict(
    img_size=32,
    patch_size=8,
    embed_dim=32,
    depth=3,
    num_heads=2,
    pos_embed_rope_base=100.0,
    pos_embed_rope_dtype="fp32",
    layerscale_init=1e-5,
    norm_layer="layernormbf16",
    n_storage_tokens=2,
    mask_k_bias=True,
)


def _ref_vit(**overrides):
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from dinov3.models.vision_transformer import DinoVisionTransformer

    kwargs = {**TINY, **overrides}
    torch.manual_seed(0)
    m = DinoVisionTransformer(**kwargs)
    m.init_weights()
    # randomize what init_weights leaves at zero/constant so parity is
    # non-trivial everywhere
    with torch.no_grad():
        for name, p in m.named_parameters():
            if p.ndim == 1 or "token" in name:
                p.add_(0.05 * torch.randn_like(p))
        if kwargs.get("mask_k_bias"):
            # pretrained checkpoints carry the k-masked bias pattern; the
            # constructor leaves the buffer NaN (attention.py:36)
            for blk in m.blocks:
                bm = blk.attn.qkv.bias_mask
                third = bm.numel() // 3
                bm.fill_(1.0)
                bm[third : 2 * third] = 0.0
    m.eval()
    return m


def _port(m, cfg, tmp_path):
    from omgsr_tpu.convert.porters import port_dinov3_vit

    pth = tmp_path / "vit.pth"
    torch.save(m.state_dict(), pth)
    return port_dinov3_vit(str(pth), cfg)


def _cfg(**overrides):
    base = dict(
        patch_size=8,
        embed_dim=32,
        depth=3,
        num_heads=2,
        n_storage_tokens=2,
    )
    base.update(overrides)
    return DinoV3ViTConfig(**base)


def _image(b=2, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, 3, h, w)).astype(np.float32)


def _assert_close(jx, tx, tol=2e-5, what=""):
    np.testing.assert_allclose(
        np.asarray(jx), tx.detach().numpy(), rtol=tol, atol=tol, err_msg=what
    )


@pytest.mark.parametrize(
    "ref_kw,cfg_kw",
    [
        ({}, {}),
        ({"ffn_layer": "swiglu", "ffn_ratio": 6.0}, {"ffn_layer": "swiglu", "ffn_ratio": 6.0}),
        ({"qkv_bias": False, "mask_k_bias": False}, {"qkv_bias": False}),
        (
            {"untie_cls_and_patch_norms": True},
            {"untie_cls_and_patch_norms": True},
        ),
    ],
    ids=["mlp", "swiglu", "no-qkv-bias", "untied-norms"],
)
def test_forward_features_matches_reference(tmp_path, ref_kw, cfg_kw):
    m = _ref_vit(**ref_kw)
    cfg = _cfg(**cfg_kw)
    params = _port(m, cfg, tmp_path)
    x = _image()
    with torch.no_grad():
        ref = m.forward_features(torch.from_numpy(x))
    out = dinov3_vit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(out["x_norm_clstoken"], ref["x_norm_clstoken"], what="cls")
    _assert_close(out["x_storage_tokens"], ref["x_storage_tokens"], what="storage")
    _assert_close(out["x_norm_patchtokens"], ref["x_norm_patchtokens"], what="patch")
    _assert_close(out["x_prenorm"], ref["x_prenorm"], what="prenorm")


def test_nonsquare_grid_matches_reference(tmp_path):
    """H != W exercises the separate-axis RoPE coordinate normalization."""
    m = _ref_vit()
    cfg = _cfg()
    params = _port(m, cfg, tmp_path)
    x = _image(b=1, h=24, w=40, seed=3)
    with torch.no_grad():
        ref = m.forward_features(torch.from_numpy(x))
    out = dinov3_vit_apply(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(out["x_norm_patchtokens"], ref["x_norm_patchtokens"])


def test_masked_tokens_match_reference(tmp_path):
    """iBOT-style masking swaps patch embeddings for the mask token."""
    m = _ref_vit()
    cfg = _cfg()
    params = _port(m, cfg, tmp_path)
    x = _image(b=2)
    n_patches = (32 // 8) ** 2
    rng = np.random.default_rng(7)
    masks = rng.random((2, n_patches)) < 0.3
    with torch.no_grad():
        ref = m.forward_features(torch.from_numpy(x), masks=torch.from_numpy(masks))
    out = dinov3_vit_apply(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), masks=jnp.asarray(masks)
    )
    _assert_close(out["x_norm_patchtokens"], ref["x_norm_patchtokens"])
    _assert_close(out["x_norm_clstoken"], ref["x_norm_clstoken"])


def test_intermediate_layers_match_reference(tmp_path):
    m = _ref_vit()
    cfg = _cfg()
    params = _port(m, cfg, tmp_path)
    x = _image(b=1)
    with torch.no_grad():
        ref = m.get_intermediate_layers(
            torch.from_numpy(x), n=[0, 2], reshape=True, norm=True
        )
    outs = get_intermediate_layers(
        params, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)), n=[0, 2], reshape=True
    )
    for o, r in zip(outs, ref):
        # reference reshape returns NCHW
        _assert_close(jnp.transpose(o, (0, 3, 1, 2)), r)


def test_vit_features_shapes():
    cfg = _cfg()
    params = init_dinov3_vit(jax.random.key(0), cfg)
    x = jnp.zeros((1, 32, 32, 3))
    feats = vit_features(params, cfg, x, layers=3)
    assert len(feats) == 3
    assert all(f.shape == (1, 4, 4, cfg.embed_dim) for f in feats)


def test_published_size_param_counts():
    """Size table sanity: parameter counts of the hub configs (computed via
    eval_shape — nothing is materialized). ViT-L/16 is the published 300M
    model; ViT-7B/16 is 6.7B."""
    from omgsr_tpu.models.layers import count_params

    def n_params(name):
        cfg = VIT_SIZES[name]
        tree = jax.eval_shape(lambda k: init_dinov3_vit(k, cfg), jax.random.key(0))
        return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))

    assert 299e6 < n_params("vitl16") < 305e6
    assert 6.6e9 < n_params("vit7b16") < 6.8e9
    assert 85e6 < n_params("vitb16") < 87e6


def test_remat_blocks_preserves_values_and_grads():
    """cfg.remat_blocks is a pure memory lever: forward values and grads
    are bitwise-stable vs the unremat'd graph (jax.checkpoint semantics)."""
    import dataclasses

    from omgsr_tpu.models.dinov3_vit import dinov3_vit_apply, init_dinov3_vit

    cfg = DinoV3ViTConfig(embed_dim=32, depth=2, num_heads=2, patch_size=8)
    cfg_r = dataclasses.replace(cfg, remat_blocks=True)
    params = init_dinov3_vit(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))

    def loss(p, c):
        out = dinov3_vit_apply(p, c, x)
        return jnp.sum(out["x_norm_clstoken"] ** 2) + jnp.sum(
            out["x_norm_patchtokens"] ** 2
        )

    v0, g0 = jax.value_and_grad(lambda p: loss(p, cfg))(params)
    v1, g1 = jax.value_and_grad(lambda p: loss(p, cfg_r))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
