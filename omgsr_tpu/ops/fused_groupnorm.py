"""Fused GroupNorm(+SiLU) Pallas TPU kernels.

The VAE/UNet ResNet blocks are chains of GroupNorm -> SiLU -> conv; on big
NHWC activations GroupNorm is HBM-bandwidth-bound. XLA computes it as
separate mean/var reductions plus a normalize pass (3 reads + 1 write);
here a single fused stats kernel computes sum and sum-of-squares in one
streaming pass, and the apply kernel does normalize+affine+SiLU in one more
(2 reads + 1 write total).

Mosaic-friendly layout notes: the channel (lane) dimension is never
reshaped; per-group reductions/broadcasts go through a (C, G) one-hot
group-assignment matrix (an MXU matmul), and the per-group stats are stored
channel-expanded. Two pallas_calls because TPU output blocks may only be
revisited in consecutive grid steps (stats accumulate per row-block, apply
streams again).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_matrix(c: int, groups: int) -> np.ndarray:
    """(C, G) one-hot assignment: channel i belongs to group i // (C/G)."""
    a = np.zeros((c, groups), np.float32)
    cg = c // groups
    for i in range(c):
        a[i, i // cg] = 1.0
    return a


def _stats_kernel(x_ref, a_ref, s_ref, *, rows, block_rows):
    j = pl.program_id(1)
    row0 = j * block_rows
    ridx = jax.lax.broadcasted_iota(jnp.int32, (block_rows, 1), 0) + row0
    valid = (ridx < rows).astype(jnp.float32)

    @pl.when(j == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    x = x_ref[0].astype(jnp.float32) * valid  # (block_rows, C)
    a = a_ref[:]  # (C, G)
    s_ref[0, 0, :] += jnp.dot(
        jnp.sum(x, axis=0, keepdims=True), a, preferred_element_type=jnp.float32
    )[0]
    s_ref[0, 1, :] += jnp.dot(
        jnp.sum(x * x, axis=0, keepdims=True), a, preferred_element_type=jnp.float32
    )[0]


def _apply_kernel(x_ref, s_ref, a_ref, scale_ref, bias_ref, o_ref, *, eps, rows, cg, apply_silu):
    a = a_ref[:]  # (C, G)
    n = rows * cg
    mean_g = s_ref[0, 0, :] / n  # (G,)
    var_g = s_ref[0, 1, :] / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast per-group values to channels: (1,G) @ (G,C) via a^T
    mean_c = jnp.dot(mean_g[None, :], a.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g[None, :], a.T, preferred_element_type=jnp.float32)
    x = x_ref[0].astype(jnp.float32)  # (block_rows, C)
    y = (x - mean_c) * inv_c
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if apply_silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def fused_group_norm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-6, apply_silu: bool = True, block_rows: int = 512):
    """x (B, H, W, C) -> silu(group_norm(x)); exact GroupNorm semantics
    (fp32 statistics over H, W and the group's channels)."""
    b, h, w, c = x.shape
    rows = h * w
    xr = x.reshape(b, rows, c)
    block_rows = min(block_rows, max(8, 1 << (rows - 1).bit_length()))
    pad = (-rows) % block_rows
    if pad:
        xr = jnp.pad(xr, ((0, 0), (0, pad), (0, 0)))
    nb = xr.shape[1] // block_rows
    amat = jnp.asarray(_group_matrix(c, groups))

    stats = pl.pallas_call(
        functools.partial(_stats_kernel, rows=rows, block_rows=block_rows),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda b_, j: (b_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, groups), lambda b_, j: (b_, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, groups), jnp.float32),
    )(xr, amat)

    out = pl.pallas_call(
        functools.partial(
            _apply_kernel, eps=eps, rows=rows, cg=c // groups, apply_silu=apply_silu
        ),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda b_, j: (b_, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, groups), lambda b_, j: (b_, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c), lambda b_, j: (b_, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xr.shape, x.dtype),
    )(xr, stats, amat, scale, bias)

    if pad:
        out = out[:, :rows, :]
    return out.reshape(b, h, w, c)
