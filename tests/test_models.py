"""Shape/consistency tests for the model zoo on tiny configs (CPU, jitted)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.diffusion import latent_image_ids
from omgsr_tpu.models import clip_text as C
from omgsr_tpu.models import convnext as CN
from omgsr_tpu.models import flux as F
from omgsr_tpu.models import t5 as T
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from omgsr_tpu.models.configs import (
    CLIPTextConfig,
    ConvNeXtConfig,
    FluxConfig,
    T5Config,
    UNetConfig,
    VAEConfig,
)

TINY_VAE = VAEConfig(block_out_channels=(8, 16), norm_num_groups=4, latent_channels=4)
TINY_FLUX_VAE = VAEConfig(
    block_out_channels=(8, 16),
    norm_num_groups=4,
    latent_channels=16,
    scaling_factor=0.3611,
    shift_factor=0.1159,
    use_quant_conv=False,
    use_post_quant_conv=False,
)
TINY_UNET = UNetConfig(
    block_out_channels=(8, 16, 16, 16),
    num_attention_heads=(1, 2, 2, 2),
    cross_attention_dim=16,
    norm_num_groups=4,
)
TINY_FLUX = FluxConfig(
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=8,
    num_attention_heads=4,
    joint_attention_dim=16,
    pooled_projection_dim=8,
    axes_dims_rope=(2, 4, 2),
)


class TestVAE:
    def test_roundtrip_shapes(self):
        p = V.init_vae(jax.random.key(0), TINY_VAE)
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
        enc = jax.jit(lambda p, x: V.vae_encode(p, TINY_VAE, x, jax.random.key(2)))
        dec = jax.jit(lambda p, z: V.vae_decode(p, TINY_VAE, z))
        z = enc(p, x)
        assert z.shape == (2, 16, 16, 4)
        y = dec(p, z)
        assert y.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(y)).all()

    def test_deterministic_mode_is_mean(self):
        p = V.init_vae(jax.random.key(0), TINY_VAE)
        x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
        z1 = V.vae_encode(p, TINY_VAE, x, rng=None)
        z2 = V.vae_encode(p, TINY_VAE, x, rng=None)
        np.testing.assert_array_equal(np.asarray(z1), np.asarray(z2))

    def test_flux_variant_shift_scale(self):
        p = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        assert "quant_conv" not in p and "post_quant_conv" not in p
        x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
        moments = V.vae_encode_features(p, TINY_FLUX_VAE, x)
        mean = np.asarray(moments)[..., :16]
        z = V.vae_encode(p, TINY_FLUX_VAE, x, rng=None)
        np.testing.assert_allclose(
            np.asarray(z), (mean - 0.1159) * 0.3611, rtol=1e-5, atol=1e-5
        )
        # decode inverts scaling before the net
        y = V.vae_decode(p, TINY_FLUX_VAE, z)
        assert y.shape == (1, 32, 32, 3)

    def test_sampling_uses_rng(self):
        p = V.init_vae(jax.random.key(0), TINY_VAE)
        x = jax.random.normal(jax.random.key(1), (1, 32, 32, 3))
        za = V.vae_encode(p, TINY_VAE, x, rng=jax.random.key(10))
        zb = V.vae_encode(p, TINY_VAE, x, rng=jax.random.key(11))
        assert np.abs(np.asarray(za) - np.asarray(zb)).max() > 0


class TestUNet:
    def test_forward(self):
        p = U.init_unet(jax.random.key(0), TINY_UNET)
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (2, 7, 16))
        fn = jax.jit(lambda p, x, c: U.unet_apply(p, TINY_UNET, x, 273, c))
        out = fn(p, x, ctx)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_timestep_sensitivity(self):
        p = U.init_unet(jax.random.key(0), TINY_UNET)
        x = jax.random.normal(jax.random.key(1), (1, 16, 16, 4))
        ctx = jax.random.normal(jax.random.key(2), (1, 7, 16))
        o1 = U.unet_apply(p, TINY_UNET, x, 273, ctx)
        o2 = U.unet_apply(p, TINY_UNET, x, 900, ctx)
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6

    def test_param_count_full_sd21(self):
        from omgsr_tpu.models.configs import SD21_UNET

        shapes = jax.eval_shape(lambda k: U.init_unet(k, SD21_UNET), jax.random.key(0))
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert n == 865_910_724  # diffusers UNet2DConditionModel SD2.1-base

    def test_vae_param_count_full_sd(self):
        from omgsr_tpu.models.configs import SD21_VAE

        shapes = jax.eval_shape(lambda k: V.init_vae(k, SD21_VAE), jax.random.key(0))
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert n == 83_653_863  # diffusers AutoencoderKL SD


class TestFlux:
    def test_forward(self):
        p = F.init_flux(jax.random.key(0), TINY_FLUX)
        img_ids = latent_image_ids(4, 4)
        txt_ids = jnp.zeros((5, 3))
        x = jax.random.normal(jax.random.key(1), (2, 16, 64))
        ctx = jax.random.normal(jax.random.key(2), (2, 5, 16))
        pooled = jax.random.normal(jax.random.key(3), (2, 8))
        fn = jax.jit(
            lambda p, x, c, pl: F.flux_apply(p, TINY_FLUX, x, 0.5, 1.0, pl, c, txt_ids, img_ids)
        )
        out = fn(p, x, ctx, pooled)
        assert out.shape == (2, 16, 64)
        assert np.isfinite(np.asarray(out)).all()

    def test_guidance_sensitivity(self):
        p = F.init_flux(jax.random.key(0), TINY_FLUX)
        img_ids = latent_image_ids(4, 4)
        txt_ids = jnp.zeros((5, 3))
        x = jax.random.normal(jax.random.key(1), (1, 16, 64))
        ctx = jax.random.normal(jax.random.key(2), (1, 5, 16))
        pooled = jax.random.normal(jax.random.key(3), (1, 8))
        o1 = F.flux_apply(p, TINY_FLUX, x, 0.5, 1.0, pooled, ctx, txt_ids, img_ids)
        o2 = F.flux_apply(p, TINY_FLUX, x, 0.5, 4.0, pooled, ctx, txt_ids, img_ids)
        assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6

    def test_param_count_full_dev(self):
        from omgsr_tpu.models.configs import FLUX_DEV

        shapes = jax.eval_shape(lambda k: F.init_flux(k, FLUX_DEV), jax.random.key(0))
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert abs(n - 11_901_408_320) < 2_000_000  # FLUX.1-dev transformer ~11.9B

    def test_rope_rotation_properties(self):
        ids = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 3.0, 5.0]])
        cos, sin = F.rope_cos_sin(ids, (2, 4, 2))
        assert cos.shape == (2, 4)
        # zero position -> identity rotation
        np.testing.assert_allclose(np.asarray(cos[0]), 1.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(sin[0]), 0.0, atol=1e-7)
        x = jax.random.normal(jax.random.key(0), (1, 2, 2, 8))
        out = F.apply_rope(x, cos, sin)
        # rotation preserves pairwise norms
        xf = np.asarray(x).reshape(1, 2, 2, 4, 2)
        of = np.asarray(out).reshape(1, 2, 2, 4, 2)
        np.testing.assert_allclose(
            (xf**2).sum(-1), (of**2).sum(-1), rtol=1e-5, atol=1e-5
        )


class TestTextEncoders:
    def test_clip(self):
        cfg = CLIPTextConfig(
            vocab_size=100, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, eos_token_id=99,
        )
        p = C.init_clip_text(jax.random.key(0), cfg)
        ids = jnp.asarray([[5, 7, 99, 0, 0], [3, 99, 0, 0, 0]], jnp.int32)
        hidden, pooled = jax.jit(lambda p, i: C.clip_text_apply(p, cfg, i))(p, ids)
        assert hidden.shape == (2, 5, 16)
        assert pooled.shape == (2, 16)
        # pooled = hidden at EOS position
        np.testing.assert_allclose(np.asarray(pooled[0]), np.asarray(hidden[0, 2]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(pooled[1]), np.asarray(hidden[1, 1]), rtol=1e-6)

    def test_clip_causality(self):
        cfg = CLIPTextConfig(
            vocab_size=100, hidden_size=16, intermediate_size=32, num_hidden_layers=2,
            num_attention_heads=2, eos_token_id=99,
        )
        p = C.init_clip_text(jax.random.key(0), cfg)
        a = jnp.asarray([[5, 7, 9, 11, 99]], jnp.int32)
        b = jnp.asarray([[5, 7, 9, 50, 99]], jnp.int32)  # differs at pos 3
        ha, _ = C.clip_text_apply(p, cfg, a)
        hb, _ = C.clip_text_apply(p, cfg, b)
        # positions before 3 unaffected by future-token change
        np.testing.assert_allclose(np.asarray(ha[:, :3]), np.asarray(hb[:, :3]), atol=1e-5)
        assert np.abs(np.asarray(ha[:, 3:]) - np.asarray(hb[:, 3:])).max() > 1e-6

    def test_t5(self):
        cfg = T5Config(vocab_size=100, d_model=16, d_kv=4, d_ff=32, num_layers=2, num_heads=4)
        p = T.init_t5_encoder(jax.random.key(0), cfg)
        ids = jnp.asarray([[5, 7, 9, 1, 0, 0]], jnp.int32)
        mask = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.int32)
        out = jax.jit(lambda p, i, m: T.t5_encode(p, cfg, i, m))(p, ids, mask)
        assert out.shape == (1, 6, 16)
        assert np.isfinite(np.asarray(out)).all()

    def test_t5_position_bias_buckets(self):
        # bucketing symmetric ranges: diag is bucket 0
        from omgsr_tpu.models.t5 import _relative_position_bucket

        rel = np.arange(-5, 6)
        buckets = _relative_position_bucket(rel)
        assert buckets[5] == 0  # rel 0
        assert (buckets[6:] >= 16).all()  # positive direction offset by half


class TestConvNeXt:
    def test_features(self):
        cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32))
        p = CN.init_convnext(jax.random.key(0), cfg)
        x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
        feats = jax.jit(lambda p, x: CN.convnext_features(p, x, 3))(p, x)
        assert [f.shape for f in feats] == [
            (1, 16, 16, 8),
            (1, 8, 8, 16),
            (1, 4, 4, 24),
        ]

    def test_normalize_from_pm1(self):
        x = jnp.zeros((1, 2, 2, 3))  # [-1,1] zero -> 0.5 in [0,1]
        n = np.asarray(CN.normalize_from_pm1(x))
        expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        np.testing.assert_allclose(n[0, 0, 0], expected, rtol=1e-5)

    def test_param_count_large(self):
        from omgsr_tpu.models.configs import CONVNEXT_SIZES

        shapes = jax.eval_shape(
            lambda k: CN.init_convnext(k, CONVNEXT_SIZES["large"]), jax.random.key(0)
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        # ConvNeXt-L backbone (no head/final norm): ~196M
        assert 190e6 < n < 200e6


class TestFluxScanBlocks:
    def test_stacked_scan_matches_unrolled(self):
        from omgsr_tpu.models.flux import stack_block_params

        p = F.init_flux(jax.random.key(0), TINY_FLUX)
        img_ids = latent_image_ids(4, 4)
        txt_ids = jnp.zeros((5, 3))
        x = jax.random.normal(jax.random.key(1), (2, 16, 64))
        ctx = jax.random.normal(jax.random.key(2), (2, 5, 16))
        pooled = jax.random.normal(jax.random.key(3), (2, 8))
        ref = F.flux_apply(p, TINY_FLUX, x, 0.5, 1.0, pooled, ctx, txt_ids, img_ids)
        ps = stack_block_params(p)
        out = F.flux_apply(ps, TINY_FLUX, x, 0.5, 1.0, pooled, ctx, txt_ids, img_ids)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_convnext_forward_features_matches_vendored():
    """convnext_forward_features == the ACTUAL vendored ConvNeXt
    forward_features (pooled-cls concat + final LN, convnext.py:207-235) on
    shared weights through port_dinov3_convnext (incl. the final norm)."""
    import sys

    import torch

    REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    from dinov3.models.convnext import ConvNeXt

    from omgsr_tpu.convert.porters import port_dinov3_convnext

    torch.manual_seed(0)
    cfg = ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(8, 12, 16, 24))
    m = ConvNeXt(depths=list(cfg.depths), dims=list(cfg.dims))
    m.init_weights()
    with torch.no_grad():  # non-trivial final-LN affine
        m.norm.weight.normal_(1.0, 0.2)
        m.norm.bias.normal_(0, 0.2)
    m.eval()
    params = port_dinov3_convnext(m.state_dict(), cfg=cfg)
    assert "norm" in params
    x = np.random.default_rng(1).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = m.forward_features(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = CN.convnext_forward_features(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got["x_norm_clstoken"]), want["x_norm_clstoken"].numpy(),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got["x_norm_patchtokens"]), want["x_norm_patchtokens"].numpy(),
        rtol=2e-4, atol=2e-5,
    )
