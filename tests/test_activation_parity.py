"""End-to-end activation parity: JAX models vs independent torch
re-implementations from the SAME param tree (tests/torch_ref_models.py).

This is SURVEY §4's weight-port parity strategy realized without real
checkpoints: any conv-orientation, norm-eps, attention-scaling, GEGLU,
skip-ordering, or timestep-embedding mistake shows up as a mismatch."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from omgsr_tpu.diffusion.schedules import mid_timestep_coeffs_sd
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from tests.test_models import TINY_UNET, TINY_VAE
from tests.torch_ref_models import (
    torch_unet_apply,
    torch_vae_decode,
    torch_vae_encode_features,
)


def _nchw(x):
    return torch.from_numpy(np.asarray(x, np.float32).transpose(0, 3, 1, 2))


def _nhwc(x):
    return x.detach().numpy().transpose(0, 2, 3, 1)


def test_vae_encoder_parity():
    p = V.init_vae(jax.random.key(0), TINY_VAE)
    x = jnp.tanh(jax.random.normal(jax.random.key(1), (1, 32, 32, 3)))
    ours = np.asarray(V.vae_encode_features(p, TINY_VAE, x))
    with torch.no_grad():
        ref = _nhwc(torch_vae_encode_features(p, TINY_VAE, _nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_vae_decoder_parity():
    p = V.init_vae(jax.random.key(0), TINY_VAE)
    z = jax.random.normal(jax.random.key(2), (1, 16, 16, 4)) * 0.3
    ours = np.asarray(V.vae_decode(p, TINY_VAE, z, unscale=False))
    with torch.no_grad():
        ref = _nhwc(torch_vae_decode(p, TINY_VAE, _nchw(z)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_unet_parity_at_mid_timestep():
    p = U.init_unet(jax.random.key(3), TINY_UNET)
    z = jax.random.normal(jax.random.key(4), (2, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(5), (2, 7, 16))
    ours = np.asarray(U.unet_apply(p, TINY_UNET, z, 273, ctx))
    with torch.no_grad():
        ref = _nhwc(
            torch_unet_apply(
                p, TINY_UNET, _nchw(z), 273, torch.from_numpy(np.asarray(ctx, np.float32))
            )
        )
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=2e-3)


def test_one_step_pipeline_parity():
    """Full one-step SR: encode (mean) -> UNet@273 -> x0 -> decode -> clamp,
    JAX vs torch, end to end."""
    vp = V.init_vae(jax.random.key(0), TINY_VAE)
    up = U.init_unet(jax.random.key(3), TINY_UNET)
    lq = jnp.tanh(jax.random.normal(jax.random.key(6), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(7), (1, 7, 16))
    sa, s1 = mid_timestep_coeffs_sd(273)

    # JAX
    z = V.vae_encode(vp, TINY_VAE, lq, rng=None)
    eps = U.unet_apply(up, TINY_UNET, z, 273, ctx)
    z0 = (z - s1 * eps) / sa
    ours = np.asarray(jnp.clip(V.vae_decode(vp, TINY_VAE, z0), -1, 1))

    # torch
    with torch.no_grad():
        moments = torch_vae_encode_features(vp, TINY_VAE, _nchw(lq))
        mean = moments[:, :4] * TINY_VAE.scaling_factor
        t_eps = torch_unet_apply(
            up, TINY_UNET, mean, 273, torch.from_numpy(np.asarray(ctx, np.float32))
        )
        t_z0 = (mean - s1 * t_eps) / sa
        ref = _nhwc(torch.clamp(torch_vae_decode(vp, TINY_VAE, t_z0 / TINY_VAE.scaling_factor), -1, 1))

    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=2e-3)


def test_flux_parity():
    from omgsr_tpu.diffusion import latent_image_ids
    from omgsr_tpu.models import flux as FX
    from tests.test_models import TINY_FLUX
    from tests.torch_ref_models import torch_flux_apply

    p = FX.init_flux(jax.random.key(8), TINY_FLUX)
    tok = jax.random.normal(jax.random.key(9), (2, 16, 64))
    ctx = jax.random.normal(jax.random.key(10), (2, 5, 16))
    pooled = jax.random.normal(jax.random.key(11), (2, 8))
    img_ids = latent_image_ids(4, 4)
    txt_ids = jnp.zeros((5, 3))
    ours = np.asarray(
        FX.flux_apply(p, TINY_FLUX, tok, 0.5, 1.25, pooled, ctx, txt_ids, img_ids)
    )
    with torch.no_grad():
        ref = torch_flux_apply(
            p, TINY_FLUX,
            torch.from_numpy(np.asarray(tok, np.float32)), 0.5, 1.25,
            torch.from_numpy(np.asarray(pooled, np.float32)),
            torch.from_numpy(np.asarray(ctx, np.float32)),
            torch.from_numpy(np.asarray(txt_ids, np.float32)),
            torch.from_numpy(np.asarray(img_ids, np.float32)),
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=2e-3)


def test_convnext_and_dists_parity():
    from omgsr_tpu.losses.dists import dists_loss, init_dists
    from omgsr_tpu.models import convnext as CN
    from omgsr_tpu.models.configs import ConvNeXtConfig
    from tests.torch_ref_models import torch_convnext_features, torch_dists

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32))
    p = CN.init_convnext(jax.random.key(12), cfg)
    x = jnp.tanh(jax.random.normal(jax.random.key(13), (1, 64, 64, 3)))

    ours = CN.convnext_features(p, CN.normalize_from_pm1(x), 3)
    with torch.no_grad():
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, -1, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, -1, 1, 1)
        xt = _nchw(x) * 0.5 + 0.5
        ref = torch_convnext_features(p, (xt - mean) / std, 3)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1), atol=5e-5, rtol=1e-3
        )

    y = jnp.tanh(jax.random.normal(jax.random.key(14), (1, 64, 64, 3)))
    st = init_dists(p, cfg.dims)
    ours_d = float(dists_loss(st, x, y))
    with torch.no_grad():
        ref_d = torch_dists(p, [3] + list(cfg.dims[:3]), _nchw(x), _nchw(y))
    np.testing.assert_allclose(ours_d, ref_d, atol=1e-4, rtol=1e-3)
