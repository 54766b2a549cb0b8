"""FLUX latent 2x2 packing/unpacking and RoPE position ids.

FLUX's DiT consumes the 16-channel VAE latent as a token sequence where each
token is a 2x2 spatial patch (64 features). Reference behavior:
_pack_latents / _unpack_latents / _prepare_latent_image_ids
(train/train_omgsr_f.py:55-94).

The reference works in NCHW; this framework keeps image tensors in NHWC
(TPU-native conv layout), so pack/unpack here are NHWC <-> (B, S, C*4) with
the same token ordering and intra-token feature ordering as the reference:
feature index = c*4 + dy*2 + dx, token index = (y//2)*(W//2) + (x//2).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_latents(latents: jnp.ndarray) -> jnp.ndarray:
    """NHWC latent (B, H, W, C) -> packed tokens (B, H//2 * W//2, C*4).

    Matches torch's _pack_latents (train/train_omgsr_f.py:74-79): token
    features are ordered [c0(2x2 row-major), c1(2x2), ...].
    """
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    # -> (B, H/2, W/2, C, 2, 2)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents(tokens: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Packed tokens (B, S, C*4) -> NHWC latent (B, height, width, C*... /4).

    ``height``/``width`` are the *latent* spatial dims (the reference passes
    pixel dims and divides by vae_scale_factor, train/train_omgsr_f.py:81-94;
    here callers pass latent dims directly).
    """
    b, s, cf = tokens.shape
    c = cf // 4
    x = tokens.reshape(b, height // 2, width // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, height, width, c)


def latent_image_ids(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """RoPE position ids for the packed latent grid: (H*W, 3) of (0, y, x).

    ``height``/``width`` are the packed-token grid dims (latent dims // 2).
    Reference: _prepare_latent_image_ids (train/train_omgsr_f.py:55-66).
    """
    ids = np.zeros((height, width, 3), dtype=np.float32)
    ids[..., 1] = np.arange(height)[:, None]
    ids[..., 2] = np.arange(width)[None, :]
    return jnp.asarray(ids.reshape(height * width, 3), dtype=dtype)
