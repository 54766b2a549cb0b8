"""LPIPS parity vs a torch transcription of the official implementation
(lpips package LPIPS(net='vgg') forward), on shared random weights pushed
through the production porter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from omgsr_tpu.utils.lpips import (
    VGG16_CHANNELS,
    VGG16_SLICES,
    init_lpips,
    lpips,
    port_lpips,
)


def _random_state_dicts(seed=0):
    """torchvision-layout vgg16 features + lpips-layout lins, random."""
    g = torch.Generator().manual_seed(seed)
    sd_v, cin = {}, 3
    for slice_idxs, cout in zip(VGG16_SLICES, VGG16_CHANNELS):
        for idx in slice_idxs:
            sd_v[f"features.{idx}.weight"] = torch.randn(
                (cout, cin, 3, 3), generator=g
            ) / np.sqrt(9 * cin)
            sd_v[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.01
            cin = cout
    sd_l = {
        f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=g) / c
        for i, c in enumerate(VGG16_CHANNELS)
    }
    return sd_v, sd_l


def _torch_lpips(sd_v, sd_l, x, y):
    """Transcription of lpips.LPIPS(net='vgg', spatial=False).forward for
    [-1,1] NCHW inputs (ScalingLayer -> vgg slices -> unit-normalize ->
    squared diff -> 1x1 lins -> spatial mean -> sum)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def slices(t):
        h = (t - shift) / scale
        out = []
        for si, slice_idxs in enumerate(VGG16_SLICES):
            if si:
                h = F.max_pool2d(h, 2, 2)
            for idx in slice_idxs:
                h = F.relu(
                    F.conv2d(h, sd_v[f"features.{idx}.weight"],
                             sd_v[f"features.{idx}.bias"], padding=1)
                )
            out.append(h)
        return out

    def unit(t, eps=1e-10):
        return t / (torch.sqrt((t**2).sum(1, keepdim=True)) + eps)

    total = 0.0
    for i, (a, b) in enumerate(zip(slices(x), slices(y))):
        d = (unit(a) - unit(b)) ** 2
        total = total + F.conv2d(d, sd_l[f"lin{i}.model.1.weight"]).mean((2, 3))
    return total[:, 0]


def test_lpips_matches_torch_reference():
    sd_v, sd_l = _random_state_dicts()
    params = port_lpips(sd_v, sd_l)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 40, 48, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.2, x.shape), -1, 1).astype(np.float32)
    ours = np.asarray(lpips(params, jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_lpips(
        sd_v, sd_l,
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(y.transpose(0, 3, 1, 2)),
    ).numpy()
    assert ours.shape == (2,)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_lpips_zero_on_identical_and_positive_on_noise():
    params = init_lpips(jax.random.key(0))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    same = float(lpips(params, x, x)[0])
    assert same == pytest.approx(0.0, abs=1e-6)
    y = jnp.clip(x + 0.3 * jax.random.normal(jax.random.key(2), x.shape), -1, 1)
    assert float(lpips(params, x, y)[0]) > 1e-4


def test_port_rejects_bad_lin_shapes():
    sd_v, sd_l = _random_state_dicts()
    sd_l["lin0.model.1.weight"] = torch.rand((1, 7, 1, 1))
    with pytest.raises(ValueError, match="lin0"):
        port_lpips(sd_v, sd_l)
