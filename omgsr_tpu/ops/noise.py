"""Gaussian and Poisson (shot) noise, batched + jitted.

Re-implements the *_pt noise family of dataset/degradations.py:
  * Gaussian: sigma drawn per sample from sigma_range, measured in /255
    units; optional per-sample gray noise blended by a bernoulli(gray_prob)
    mask (:464-557);
  * Poisson: image quantized to 255 levels, per-sample vals =
    2^ceil(log2(#unique values)), noise = poisson(img*vals)/vals - img,
    scaled per sample from scale_range, with the same gray-noise mixing
    (:563-727). The #unique count is computed with a 256-bin histogram
    (exact for the quantized image) instead of torch.unique — jit-friendly,
    no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gray_mix(noise_color, noise_gray, gray_mask):
    return noise_color * (1 - gray_mask) + noise_gray * gray_mask


def add_gaussian_noise(key, img, sigma_range, gray_prob: float, clip: bool = True):
    """img (B,H,W,C) in [0,1]."""
    b, h, w, c = img.shape
    k_sigma, k_gray, k_noise, k_gnoise = jax.random.split(key, 4)
    sigma = jax.random.uniform(
        k_sigma, (b, 1, 1, 1), jnp.float32, sigma_range[0], sigma_range[1]
    )
    gray_mask = (jax.random.uniform(k_gray, (b, 1, 1, 1)) < gray_prob).astype(jnp.float32)
    noise = jax.random.normal(k_noise, img.shape, jnp.float32) * sigma / 255.0
    noise_gray = jax.random.normal(k_gnoise, (b, h, w, 1), jnp.float32) * sigma / 255.0
    out = img.astype(jnp.float32) + _gray_mix(noise, noise_gray, gray_mask)
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out.astype(img.dtype)


def _quantize_255(img):
    return jnp.clip(jnp.round(img * 255.0), 0.0, 255.0) / 255.0


def _unique_vals(imgq):
    """Per-sample 2^ceil(log2(#unique)) over a 255-quantized image (B,H,W,C)."""
    b = imgq.shape[0]
    levels = jnp.round(imgq.reshape(b, -1) * 255.0).astype(jnp.int32)
    onehot = jax.nn.one_hot(levels, 256, dtype=jnp.float32)  # (b, n, 256)
    present = (onehot.sum(axis=1) > 0).astype(jnp.float32)
    n_unique = present.sum(axis=1)
    return 2.0 ** jnp.ceil(jnp.log2(n_unique))


def _rgb_to_gray(img):
    """torchvision rgb_to_grayscale weights (0.2989, 0.587, 0.114)."""
    w = jnp.asarray([0.2989, 0.587, 0.114], img.dtype)
    return (img * w).sum(axis=-1, keepdims=True)


def add_poisson_noise(key, img, scale_range, gray_prob: float, clip: bool = True):
    """img (B,H,W,3) in [0,1]."""
    b = img.shape[0]
    k_scale, k_gray, k_poisson, k_gpoisson = jax.random.split(key, 4)
    scale = jax.random.uniform(
        k_scale, (b, 1, 1, 1), jnp.float32, scale_range[0], scale_range[1]
    )
    gray_mask = (jax.random.uniform(k_gray, (b, 1, 1, 1)) < gray_prob).astype(jnp.float32)

    imgq = _quantize_255(img.astype(jnp.float32))
    vals = _unique_vals(imgq)[:, None, None, None]
    out = jax.random.poisson(k_poisson, imgq * vals).astype(jnp.float32) / vals
    noise = out - imgq

    gray = _quantize_255(_rgb_to_gray(img.astype(jnp.float32)))
    gvals = _unique_vals(gray)[:, None, None, None]
    gout = jax.random.poisson(k_gpoisson, gray * gvals).astype(jnp.float32) / gvals
    noise_gray = gout - gray

    out = img.astype(jnp.float32) + _gray_mix(noise, noise_gray, gray_mask) * scale
    if clip:
        out = jnp.clip(out, 0.0, 1.0)
    return out.astype(img.dtype)
