"""DiffAugment (color / translation / cutout) with JAX PRNG.

Re-implements dinov3_gan/dinov3_convnext_disc.py:11-78 on NHWC tensors with
explicit keys instead of torch's global RNG. Same op order as the reference
policy string 'color,translation,cutout': brightness, saturation, contrast,
translation (zero-pad + clamped gather), cutout (half-size zero mask).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rand_brightness(key, x):
    b = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype)
    return x + (b - 0.5)


def _rand_saturation(key, x):
    r = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype)
    mean = x.mean(axis=3, keepdims=True)
    return (x - mean) * (r * 2.0) + mean


def _rand_contrast(key, x):
    r = jax.random.uniform(key, (x.shape[0], 1, 1, 1), x.dtype)
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return (x - mean) * (r + 0.5) + mean


def _rand_translation(key, x, ratio=0.125):
    b, h, w, c = x.shape
    sh = int(h * ratio + 0.5)
    sw = int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    ty = jax.random.randint(k1, (b, 1, 1), -sh, sh + 1)
    tx = jax.random.randint(k2, (b, 1, 1), -sw, sw + 1)
    gy = jnp.clip(jnp.arange(h)[None, :, None] + ty + 1, 0, h + 1)  # (b,h,1)
    gx = jnp.clip(jnp.arange(w)[None, None, :] + tx + 1, 0, w + 1)  # (b,1,w)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bidx = jnp.arange(b)[:, None, None]
    return xp[bidx, jnp.broadcast_to(gy, (b, h, w)), jnp.broadcast_to(gx, (b, h, w))]


def _rand_cutout(key, x, ratio=0.5):
    b, h, w, c = x.shape
    ch = int(h * ratio + 0.5)
    cw = int(w * ratio + 0.5)
    k1, k2 = jax.random.split(key)
    oy = jax.random.randint(k1, (b, 1, 1), 0, h + (1 - ch % 2))
    ox = jax.random.randint(k2, (b, 1, 1), 0, w + (1 - cw % 2))
    gy = jnp.arange(h)[None, :, None]
    gx = jnp.arange(w)[None, None, :]
    in_y = (gy >= oy - ch // 2) & (gy < oy - ch // 2 + ch)
    in_x = (gx >= ox - cw // 2) & (gx < ox - cw // 2 + cw)
    # replicate the reference's index clamping: the cutout window is clipped
    # to the image, so its visible area can shrink at borders
    mask = 1.0 - (in_y & in_x).astype(x.dtype)
    return x * mask[..., None]


def diff_augment(key, x, policy: str = "color,translation,cutout"):
    """Apply the augmentation policy; x NHWC."""
    if not policy:
        return x
    ks = iter(jax.random.split(key, 8))
    for p in policy.split(","):
        if p == "color":
            x = _rand_brightness(next(ks), x)
            x = _rand_saturation(next(ks), x)
            x = _rand_contrast(next(ks), x)
        elif p == "translation":
            x = _rand_translation(next(ks), x)
        elif p == "cutout":
            x = _rand_cutout(next(ks), x)
        else:
            raise ValueError(f"unknown DiffAugment policy element: {p}")
    return x
