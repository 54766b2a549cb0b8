"""Pallas 3x3 conv kernel tests (interpret mode on CPU; real kernel on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_reference


@pytest.fixture(autouse=True)
def _interpret_on_cpu(monkeypatch):
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


@pytest.mark.parametrize("h,w_,cin,cout,act", [
    (16, 128, 128, 128, "none"),
    (16, 128, 128, 128, "silu"),
    (32, 256, 128, 256, "none"),
    (8, 128, 256, 128, "silu"),
])
def test_matches_xla_conv(h, w_, cin, cout, act):
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (1, h, w_, cin), jnp.float32) * 0.5
    w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    ours = conv3x3_pallas(x, w, b, act=act, bh=8)
    ref = conv3x3_reference(x, w, b, act=act)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_bf16_close_to_f32_reference():
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (1, 16, 128, 128), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 128, 128), jnp.float32) * 0.05
    b = jnp.zeros((128,))
    ours = conv3x3_pallas(x.astype(jnp.bfloat16), w, b, bh=8)
    assert ours.dtype == jnp.bfloat16
    ref = conv3x3_reference(x, w, b)
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref), atol=0.15, rtol=0.05
    )


def test_edge_padding_correct():
    """SAME zero padding at all four borders (the kernel pre-pads)."""
    x = jnp.ones((1, 8, 128, 128), jnp.float32)
    w = jnp.ones((3, 3, 128, 128), jnp.float32)
    b = jnp.zeros((128,))
    out = np.asarray(conv3x3_pallas(x, w, b, bh=8))
    # interior: 9 taps * 128 channels; corners: 4 taps; edges: 6 taps
    np.testing.assert_allclose(out[0, 4, 64], 9 * 128, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 0], 4 * 128, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 64], 6 * 128, rtol=1e-6)
    np.testing.assert_allclose(out[0, 4, 127], 6 * 128, rtol=1e-6)


def _resblock_reference(x, p, groups=32, eps=1e-6):
    """XLA resblock: GN->SiLU->conv1->GN->SiLU->conv2 + skip (f32 stats)."""
    from omgsr_tpu.models.layers import conv2d, group_norm, silu

    h = silu(group_norm(p["norm1"], x, groups, eps))
    h = conv2d(p["conv1"], h, padding=1)
    h = silu(group_norm(p["norm2"], h, groups, eps))
    h = conv2d(p["conv2"], h, padding=1)
    return x + h


def test_fused_resblock_matches_xla():
    """conv3x3_gn_fused chained twice (stats streamed between the convs)
    reproduces the XLA resblock; validates prologue masking at the pad
    ring, skip add, and the E[x^2]-mean^2 stat path."""
    from omgsr_tpu.models.layers import group_norm
    from omgsr_tpu.ops.conv3x3 import conv3x3_gn_fused, gn_affine_from_channel_sums

    groups, c, h, w_ = 4, 128, 16, 128
    ks = jax.random.split(jax.random.key(7), 8)
    x = jax.random.normal(ks[0], (1, h, w_, c), jnp.float32) * 0.5
    p = {
        "norm1": {"scale": jax.random.normal(ks[1], (c,)) * 0.2 + 1,
                  "bias": jax.random.normal(ks[2], (c,)) * 0.1},
        "conv1": {"kernel": jax.random.normal(ks[3], (3, 3, c, c)) * 0.05,
                  "bias": jax.random.normal(ks[4], (c,)) * 0.1},
        "norm2": {"scale": jax.random.normal(ks[5], (c,)) * 0.2 + 1,
                  "bias": jax.random.normal(ks[6], (c,)) * 0.1},
        "conv2": {"kernel": jax.random.normal(ks[7], (3, 3, c, c)) * 0.05,
                  "bias": jnp.zeros((c,))},
    }
    ref = _resblock_reference(x, p, groups)

    # fold GN1 stats (computed in XLA: the first GN of a chain has streamed
    # stats from the PREVIOUS conv in the full integration)
    x32 = np.asarray(x, np.float32).reshape(h * w_, groups, c // groups)
    mean1 = x32.mean((0, 2)); var1 = x32.var((0, 2))
    sg = jax.lax.rsqrt(jnp.asarray(var1, jnp.float32) + 1e-6)
    scale1 = jnp.repeat(sg, c // groups) * p["norm1"]["scale"]
    shift1 = p["norm1"]["bias"] - jnp.repeat(jnp.asarray(mean1), c // groups) * jnp.repeat(sg, c // groups) * p["norm1"]["scale"]

    h1, ssum, ssq = conv3x3_gn_fused(
        x, p["conv1"]["kernel"], p["conv1"]["bias"], scale1, shift1, bh=8
    )
    scale2, shift2 = gn_affine_from_channel_sums(
        ssum, ssq, h * w_, groups, p["norm2"]["scale"], p["norm2"]["bias"]
    )
    y, _, _ = conv3x3_gn_fused(
        h1, p["conv2"]["kernel"], p["conv2"]["bias"], scale2, shift2,
        skip=x, bh=8, emit_stats=False,
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_fused_channel_sums_exact():
    from omgsr_tpu.ops.conv3x3 import conv3x3_gn_fused

    c, h, w_ = 128, 16, 128
    ks = jax.random.split(jax.random.key(9), 3)
    x = jax.random.normal(ks[0], (1, h, w_, c), jnp.float32) * 0.5
    w = jax.random.normal(ks[1], (3, 3, c, c)) * 0.05
    b = jax.random.normal(ks[2], (c,)) * 0.1
    # identity prologue (scale 1, shift 0) with... silu still applies; fine —
    # compare stats against the kernel's own output
    y, ssum, ssq = conv3x3_gn_fused(x, w, b, jnp.ones((c,)), jnp.zeros((c,)), bh=8)
    y32 = np.asarray(y, np.float64)
    np.testing.assert_allclose(np.asarray(ssum).sum(0), y32.sum((0, 1, 2)), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ssq).sum(0), (y32 ** 2).sum((0, 1, 2)), rtol=1e-4)


def test_fused_decode_matches_plain():
    """vae_decode with cfg.fused_resblocks routes eligible resnets through
    the Pallas kernel and must match the plain decode (f32, tiny 128-ch
    decoder; includes a conv_shortcut stage boundary 128->256... reversed
    (256,128): up0 256ch, up1 shortcut 256->128)."""
    from dataclasses import replace

    from omgsr_tpu.models import vae as V
    from omgsr_tpu.models.configs import VAEConfig

    cfg = VAEConfig(
        block_out_channels=(128, 256), norm_num_groups=32, latent_channels=4,
        mid_block_attention=False, layers_per_block=1,
    )
    p = V.init_vae(jax.random.key(21), cfg)
    p = jax.tree.map(lambda x: x * 0.3 if x.ndim == 4 else x, p)
    z = jax.random.normal(jax.random.key(22), (1, 8, 16, 4)) * 0.3
    ref = np.asarray(V.vae_decode(p, cfg, z))
    out = np.asarray(V.vae_decode(p, replace(cfg, fused_resblocks=True), z))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=3e-3, rtol=3e-3)
