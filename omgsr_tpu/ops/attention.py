"""Attention dispatch: XLA reference path + Pallas TPU flash-attention path.

All model attention in the framework funnels through ``dot_product_attention``
so the Pallas kernel (ops/flash_attention.py) can be swapped in globally.
Shapes follow jax.nn convention: (B, S, H, D).

The reference relies on torch SDPA inside diffusers (optionally xformers,
train/train_omgsr_s.py:234-240); here the equivalent fast path is a Pallas
fused kernel on TPU with an XLA fallback everywhere else.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_FLASH_MIN_SEQ = 1024  # below this, XLA's fused softmax path is already fine


def _use_pallas(q_seq: int, head_dim: int, kv_seq: int | None = None) -> bool:
    if jax.default_backend() != "tpu":
        return False
    # kv gate, default OFF: short-KV cross-attention (SD UNet's 77 text
    # tokens at q_seq 4096) looks like a pathological flash shape (KV pads
    # to one 128-lane block), but the composed 512px one-step graph
    # MEASURES flash-for-cross at parity-or-better (interleaved A/B on the
    # v5e: flash p50 100.9 ms vs xla 103.7) — so flash keeps these sites.
    # OMGSR_FLASH_MIN_KV=<n> re-routes kv_seq < n to XLA for re-probing.
    if kv_seq is not None and kv_seq < int(os.environ.get("OMGSR_FLASH_MIN_KV", "0")):
        return False
    # measured on v5e: wins for 64/128 head dims at long seq (UNet stage-1,
    # FLUX joint attention). The 512-dim single-head VAE mid block ties XLA
    # up to 16k tokens (both are VPU-bound on the S^2 softmax exp), so XLA
    # keeps it until the sequence where XLA's materialized S^2 score matrix
    # becomes the binding constraint (>= 32k tokens = 2048 px+, where P in
    # bf16 is >= 2 GB and at 4K would be 137 GB) — the kv-blocked Pallas
    # kernel streams it and stays memory-flat.
    if head_dim in (64, 128, 256):
        return q_seq >= _FLASH_MIN_SEQ
    if head_dim == 512:
        return q_seq >= 32768
    return False


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
            "flash"
            if bias is None and _use_pallas(q.shape[1], q.shape[3], k.shape[1])
            else "xla"
        )
    if implementation == "flash":
        if bias is not None:
            raise ValueError(
                "implementation='flash' does not support an attention bias "
                "(flash_attention_bshd has no bias operand) — use 'xla' for "
                "biased sites (e.g. T5 relative positions)"
            )
        from omgsr_tpu.ops.flash_attention import flash_attention_bshd

        return flash_attention_bshd(q, k, v, scale=scale)
    return jax.nn.dot_product_attention(q, k, v, bias=bias, scale=scale)
