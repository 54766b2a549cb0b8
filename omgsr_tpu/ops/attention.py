"""Attention dispatch: XLA reference path + Pallas TPU flash-attention path.

All model attention in the framework funnels through ``dot_product_attention``
so the Pallas kernel (ops/flash_attention.py) can be swapped in globally.
Shapes follow jax.nn convention: (B, S, H, D).

The reference relies on torch SDPA inside diffusers (optionally xformers,
train/train_omgsr_s.py:234-240); here the equivalent fast path is a Pallas
fused kernel on TPU with an XLA fallback everywhere else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 1024  # below this, XLA's fused softmax path is already fine


def _use_pallas(q_seq: int, head_dim: int) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # measured on v5e: wins for 64/128 head dims at long seq (UNet stage-1,
    # FLUX joint attention); the 512-dim VAE mid-block is better on XLA
    if head_dim not in (64, 128, 256):
        return False
    return q_seq >= _FLASH_MIN_SEQ


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    bias: jnp.ndarray | None = None,
    scale: float | None = None,
    implementation: str | None = None,
) -> jnp.ndarray:
    """Softmax attention over (B, S, H, D) tensors; bias (B, H, Sq, Sk).

    implementation: None (auto), "xla", or "flash" (force Pallas kernel).
    """
    if implementation is None:
        implementation = (
            "flash" if bias is None and _use_pallas(q.shape[1], q.shape[3]) else "xla"
        )
    if implementation == "flash":
        from omgsr_tpu.ops.flash_attention import flash_attention_bshd

        return flash_attention_bshd(q, k, v, scale=scale)
    return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)
