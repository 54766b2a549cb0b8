"""Pallas TPU flash attention (forward), BSHD layout.

The hot attention sites in OMGSR are long-sequence self-attention: SD UNet
first stage (4096 tokens at 512 px), VAE mid-block (4096+ tokens), FLUX
joint attention (4608 tokens per 1024-px tile). This kernel computes
softmax(q k^T / sqrt(d)) v with the online-softmax recurrence, streaming KV
in VMEM blocks so the (S_q x S_kv) score matrix never materializes in HBM —
the standard flash schedule mapped onto MXU 128-lane tiles.

Forward-only Pallas; gradients fall back to XLA attention via custom_vjp
recompute (OMGSR trains at 64x64 latents where XLA's fused attention is
already fine; inference is where long sequences appear).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 256
BLOCK_K = 512

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int, block_k: int):
    # q_ref: (BQ, D); k_ref/v_ref: (S_kv_pad, D); o_ref: (BQ, D)
    bq, d = q_ref.shape
    skv = k_ref.shape[0]
    n_blocks = skv // block_k

    q = q_ref[:].astype(jnp.float32) * scale

    def body(i, carry):
        acc, m, l = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, block_k)
        # mask padded kv positions
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + i * block_k
        s = jnp.where(col < kv_len, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc = jnp.zeros((bq, d), jnp.float32)
    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc, m, l))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = (-x.shape[axis]) % size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_bshd(q, k, v, scale: float | None = None):
    """q (B, Sq, H, D), k/v (B, Skv, H, D) -> (B, Sq, H, D)."""
    return _forward(q, k, v, scale)


def _forward(q, k, v, scale):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    block_q = min(BLOCK_Q, max(128, 1 << (sq - 1).bit_length()))
    block_q = min(block_q, BLOCK_Q)
    block_k = min(BLOCK_K, max(128, 1 << (skv - 1).bit_length()))
    block_k = min(block_k, BLOCK_K)

    # (B, S, H, D) -> (B*H, S, D)
    qh = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kh = k.transpose(0, 2, 1, 3).reshape(b * h, skv, d)
    vh = v.transpose(0, 2, 1, 3).reshape(b * h, skv, d)

    qh = _pad_to(qh, block_q, 1)
    kh = _pad_to(kh, block_k, 1)
    vh = _pad_to(vh, block_k, 1)
    sq_p = qh.shape[1]
    skv_p = kh.shape[1]

    grid = (b * h, sq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=skv, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_p, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, skv_p, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
    )(qh, kh, vh)

    out = out[:, :sq, :].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out


def _fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    q, k, v = residuals
    # recompute with XLA attention for the backward pass
    _, vjp = jax.vjp(lambda q, k, v: jax.nn.dot_product_attention(q, k, v, scale=scale), q, k, v)
    return vjp(g)


flash_attention_bshd.defvjp(_fwd, _bwd)
