"""Pallas TPU flash attention (forward + backward), BSHD layout.

The hot attention sites in OMGSR are long-sequence self-attention: SD UNet
first stage (4096 tokens at 512 px), VAE mid-block (4096+ tokens), FLUX
joint attention (4608 tokens per 1024-px tile). The forward computes
softmax(q k^T / sqrt(d)) v with the online-softmax recurrence, streaming KV
in VMEM blocks so the (S_q x S_kv) score matrix never materializes in HBM.

The backward is the standard flash recurrence from saved log-sum-exp:
  D = rowsum(dO * O)
  P = exp(q k^T * scale - LSE)
  dV = P^T dO;  dS = P * (dO V^T - D);  dQ = dS K * scale;  dK = dS^T Q * scale
split into a dQ kernel (grid over q blocks, streaming KV) and a dK/dV kernel
(grid over kv blocks, streaming Q) — neither materializes P in HBM either,
which is what makes 512-px+ LoRA-GAN training fit without checkpointing the
attention matrices.
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


# ----------------------------------------------------------------------------
# forward
# ----------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale, kv_len, block_k, n_kv
):
    """Online-softmax step for ONE kv block; the kv dimension is the
    innermost grid axis (sequential on TPU), with the running (acc, m, l)
    held in VMEM scratch across steps. KV therefore never needs to fit in
    VMEM whole — this is what admits the 512-dim VAE mid head at 16k+
    tokens (1024-4096 px decode), where resident KV alone would be 32 MB+."""
    bq, d = q_ref.shape
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        acc_ref[:] = jnp.zeros((bq, d), jnp.float32)
        m_ref[:] = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l_ref[:] = jnp.zeros((bq, 1), jnp.float32)

    q = q_ref[:].astype(jnp.float32) * scale
    k_blk = k_ref[:].astype(jnp.float32)
    v_blk = v_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + i * block_k
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m = m_ref[:]
    m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = m_new

    @pl.when(i == n_kv - 1)
    def _finish():
        l = l_ref[:]
        o_ref[:] = (acc_ref[:] / l).astype(o_ref.dtype)
        lse_ref[:] = (m_ref[:] + jnp.log(l)).astype(jnp.float32)


# ----------------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc, *, scale, kv_len, block_k, n_kv
):
    """dQ for one (q block, kv block) grid cell; kv is the innermost
    (sequential) axis with the dQ accumulator in VMEM scratch — KV never
    needs to be VMEM-resident whole (same memory-flat structure as the
    forward)."""
    bq, d = q_ref.shape
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dq_acc[:] = jnp.zeros((bq, d), jnp.float32)

    q = q_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    lse = lse_ref[:]
    delta = delta_ref[:]
    k_blk = k_ref[:].astype(jnp.float32)
    v_blk = v_ref[:].astype(jnp.float32)
    s = scale * jax.lax.dot_general(
        q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + i * block_k
    s = jnp.where(col < kv_len, s, _NEG_INF)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta)
    dq_acc[:] = dq_acc[:] + scale * jax.lax.dot_general(
        ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == n_kv - 1)
    def _finish():
        dq_ref[:] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale, q_len, block_q, n_q
):
    """dK/dV for one (kv block, q block) grid cell; q is the innermost
    (sequential) axis, accumulators in VMEM scratch — Q/dO never need to be
    VMEM-resident whole."""
    bk, d = k_ref.shape
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros((bk, d), jnp.float32)
        dv_acc[:] = jnp.zeros((bk, d), jnp.float32)

    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    q_blk = q_ref[:].astype(jnp.float32)
    do_blk = do_ref[:].astype(jnp.float32)
    lse_blk = lse_ref[:]
    delta_blk = delta_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, bk), 0) + i * block_q
    s = scale * jax.lax.dot_general(
        q_blk, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (block_q, bk)
    s = jnp.where(row < q_len, s, _NEG_INF)
    p = jnp.exp(s - lse_blk)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p, do_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do_blk, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta_blk)
    dk_acc[:] = dk_acc[:] + scale * jax.lax.dot_general(
        ds, q_blk, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == n_q - 1)
    def _finish():
        dk_ref[:] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[:] = dv_acc[:].astype(dv_ref.dtype)


# ----------------------------------------------------------------------------
# host-side wrappers
# ----------------------------------------------------------------------------


def _pad_to(x, size, axis):
    pad = (-x.shape[axis]) % size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _to_heads(x):
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_heads(x, b, h):
    bh, s, d = x.shape
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _block_sizes(sq, skv):
    bq = min(BLOCK_Q, max(128, 1 << (sq - 1).bit_length()))
    bk = min(BLOCK_K, max(128, 1 << (skv - 1).bit_length()))
    return min(bq, BLOCK_Q), min(bk, BLOCK_K)


def _forward(q, k, v, scale):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_q, block_k = _block_sizes(sq, skv)

    qh = _pad_to(_to_heads(q), block_q, 1)
    kh = _pad_to(_to_heads(k), block_k, 1)
    vh = _pad_to(_to_heads(v), block_k, 1)
    sq_p, skv_p = qh.shape[1], kh.shape[1]

    n_kv = skv_p // block_k
    grid = (b * h, sq_p // block_q, n_kv)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, kv_len=skv, block_k=block_k, n_kv=n_kv
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_q, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
    )(qh, kh, vh)
    return _from_heads(out[:, :sq], b, h), lse[:, :sq]


def _backward(q, k, v, o, lse, g, scale):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    block_q, block_k = _block_sizes(sq, skv)

    qh = _pad_to(_to_heads(q), block_q, 1)
    kh = _pad_to(_to_heads(k), block_k, 1)
    vh = _pad_to(_to_heads(v), block_k, 1)
    doh = _pad_to(_to_heads(g), block_q, 1)
    oh = _pad_to(_to_heads(o), block_q, 1)
    # delta = rowsum(dO * O); padded LSE rows get 0 (p=exp(-inf-0)=0 anyway)
    delta = jnp.sum(doh.astype(jnp.float32) * oh.astype(jnp.float32), axis=-1, keepdims=True)
    lse_p = _pad_to(lse, block_q, 1)
    sq_p, skv_p = qh.shape[1], kh.shape[1]
    bh = b * h

    n_kv = skv_p // block_k
    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, kv_len=skv, block_k=block_k, n_kv=n_kv
        ),
        grid=(bh, sq_p // block_q, n_kv),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(qh, kh, vh, doh, lse_p, delta)

    n_q = sq_p // block_q
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, q_len=sq, block_q=block_q, n_q=n_q
        ),
        grid=(bh, skv_p // block_k, n_q),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, d), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_q, 1), lambda i, j, k_: (i, k_, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, block_k, d), lambda i, j, k_: (i, j, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, skv_p, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
    )(qh, kh, vh, doh, lse_p, delta)

    return (
        _from_heads(dq[:, :sq], b, h),
        _from_heads(dk[:, :skv], b, h),
        _from_heads(dv[:, :skv], b, h),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_bshd(q, k, v, scale: float | None = None):
    """q (B, Sq, H, D), k/v (B, Skv, H, D) -> (B, Sq, H, D)."""
    out, _ = _forward(q, k, v, scale)
    return out


def _fwd(q, k, v, scale):
    out, lse = _forward(q, k, v, scale)
    return out, (q, k, v, out, lse)


def _bwd(scale, residuals, g):
    q, k, v, o, lse = residuals
    return _backward(q, k, v, o, lse, g, scale)


flash_attention_bshd.defvjp(_fwd, _bwd)
