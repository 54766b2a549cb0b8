"""Numerics-convention goldens vs torch for the building blocks where subtle
mismatches hide (SURVEY §7 hard part #1): GroupNorm eps/statistics, LayerNorm,
attention scaling, GELU variants, timestep embedding, conv padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from omgsr_tpu.models.layers import (
    conv2d,
    dense,
    gelu,
    group_norm,
    layer_norm,
    rms_norm,
    silu,
    timestep_embedding,
)
from omgsr_tpu.ops.attention import dot_product_attention


def test_group_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 5, 8)).astype(np.float32) * 3 + 1
    scale = rng.normal(size=(8,)).astype(np.float32)
    bias = rng.normal(size=(8,)).astype(np.float32)
    ours = np.asarray(group_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x), 4, 1e-6))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = TF.group_norm(xt, 4, torch.from_numpy(scale), torch.from_numpy(bias), 1e-6)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 16)).astype(np.float32)
    scale = rng.normal(size=(16,)).astype(np.float32)
    bias = rng.normal(size=(16,)).astype(np.float32)
    ours = np.asarray(layer_norm({"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}, jnp.asarray(x), 1e-5))
    ref = TF.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(scale), torch.from_numpy(bias), 1e-5)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 5, 8)).astype(np.float32)
    w = rng.normal(size=(8,)).astype(np.float32)
    ours = np.asarray(rms_norm({"scale": jnp.asarray(w)}, jnp.asarray(x), 1e-6))
    xt = torch.from_numpy(x)
    ref = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-6) * torch.from_numpy(w)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)


def test_sdpa_matches_torch():
    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 9, 2, 8)).astype(np.float32)
    k = rng.normal(size=(2, 7, 2, 8)).astype(np.float32)
    v = rng.normal(size=(2, 7, 2, 8)).astype(np.float32)
    ours = np.asarray(dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    ref = TF.scaled_dot_product_attention(
        torch.from_numpy(q.transpose(0, 2, 1, 3)),
        torch.from_numpy(k.transpose(0, 2, 1, 3)),
        torch.from_numpy(v.transpose(0, 2, 1, 3)),
    ).numpy().transpose(0, 2, 1, 3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("approximate,torch_mode", [(False, "none"), (True, "tanh")])
def test_gelu_variants_match_torch(approximate, torch_mode):
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(gelu(jnp.asarray(x), approximate=approximate))
    ref = TF.gelu(torch.from_numpy(x), approximate=torch_mode).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_silu_matches_torch():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(silu(jnp.asarray(x))), TF.silu(torch.from_numpy(x)).numpy(), atol=1e-6
    )


def test_timestep_embedding_matches_diffusers_formula():
    """Replicate diffusers.get_timestep_embedding in torch and compare
    (flip_sin_to_cos=True, downscale_freq_shift=0 — the SD2.1 UNet setting)."""
    import math

    dim = 32
    t = torch.tensor([273.0, 0.0, 999.0])
    half = dim // 2
    exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32) / half
    emb = t[:, None].float() * exponent.exp()[None, :]
    ref = torch.cat([emb.cos(), emb.sin()], dim=-1).numpy()

    ours = np.asarray(timestep_embedding(jnp.asarray([273.0, 0.0, 999.0]), dim))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_conv_same_as_torch_padding1():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 9, 11, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 6)).astype(np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    ours = np.asarray(conv2d({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}, jnp.asarray(x), padding=1))
    ref = TF.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(w.transpose(3, 2, 0, 1)),
        torch.from_numpy(b),
        padding=1,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_strided_conv_asymmetric_pad_vae_downsample():
    """diffusers VAE Downsample2D: pad (0,1,0,1) then stride-2 VALID conv."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 4)).astype(np.float32)
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (0, 1), (0, 1), (0, 0)))
    ours = np.asarray(conv2d({"kernel": jnp.asarray(w)}, xp, stride=2, padding="VALID"))
    xt = TF.pad(torch.from_numpy(x.transpose(0, 3, 1, 2)), (0, 1, 0, 1))
    ref = TF.conv2d(xt, torch.from_numpy(w.transpose(3, 2, 0, 1)), stride=2).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
