"""Shared neural-net primitives: pure apply functions over param pytrees.

Design: parameters are nested dicts whose key paths mirror the HF checkpoint
structure of the corresponding torch modules, activations are NHWC (TPU conv
native), conv kernels HWIO, dense kernels (in, out). Pure functions keep the
whole model jit/pjit/vmap/grad-transparent and make LoRA injection and
sharding annotation straight tree surgery.

Numerical conventions match the torch ops the reference runs through
diffusers (GroupNorm eps 1e-6 in VAE / 1e-5 in UNet, GELU tanh vs exact,
etc.) — those knobs are arguments, set by each model's config.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.utils.quantize import dequantize_kernel

# ----------------------------------------------------------------------------
# init helpers (torch-default-compatible: kaiming uniform, fan_in, a=sqrt(5))
# ----------------------------------------------------------------------------


def _kaiming_uniform_bound(fan_in: int) -> float:
    # torch.nn.Linear/Conv2d default: U(-b, b), b = 1/sqrt(fan_in) * sqrt(3) * gain,
    # gain for a=sqrt(5) leaky relu = sqrt(2/(1+5)) = 1/sqrt(3)  =>  b = 1/sqrt(fan_in)
    return 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0


def init_dense(key, in_dim: int, out_dim: int, use_bias: bool = True, dtype=jnp.float32):
    kk, kb = jax.random.split(key)
    b = _kaiming_uniform_bound(in_dim) * math.sqrt(3.0)
    p = {"kernel": jax.random.uniform(kk, (in_dim, out_dim), dtype, -b, b)}
    if use_bias:
        bb = _kaiming_uniform_bound(in_dim)
        p["bias"] = jax.random.uniform(kb, (out_dim,), dtype, -bb, bb)
    return p


def init_conv(key, kh: int, kw: int, in_ch: int, out_ch: int, use_bias: bool = True, dtype=jnp.float32):
    kk, kb = jax.random.split(key)
    fan_in = kh * kw * in_ch
    b = _kaiming_uniform_bound(fan_in) * math.sqrt(3.0)
    p = {"kernel": jax.random.uniform(kk, (kh, kw, in_ch, out_ch), dtype, -b, b)}
    if use_bias:
        bb = _kaiming_uniform_bound(fan_in)
        p["bias"] = jax.random.uniform(kb, (out_ch,), dtype, -bb, bb)
    return p


def init_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rms_norm(dim: int, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype)}


# ----------------------------------------------------------------------------
# apply functions
# ----------------------------------------------------------------------------


def _dense_w8a8(p, x):
    """s8 x s8 -> s32 matmul on the MXU's double-rate int8 path.

    Per-token symmetric activation quantization (row absmax / 127) against the
    per-output-channel weight scale from utils.quantize. Inference-only: the
    rounding is non-differentiable (training paths use weight-only storage,
    which `dense` dequantizes instead)."""
    x32 = x.astype(jnp.float32)
    m = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-6) / 127.0
    qx = jnp.round(x32 / m).astype(jnp.int8)  # |x|/m <= 127 by construction
    y = jnp.einsum(
        "...i,io->...o", qx, p["kernel_q"], preferred_element_type=jnp.int32
    )
    return (y.astype(jnp.float32) * m * p["kernel_scale"]).astype(x.dtype)


def dense(p, x):
    # dequantize_kernel handles both plain and weight-only-int8 storage
    # (utils.quantize): int8 kernels dequantize to the activation dtype at
    # use; the matmul stays bf16 on the MXU. An act_quant marker switches to
    # the w8a8 int8-MXU path (serving only).
    if "act_quant" in p:
        y = _dense_w8a8(p, x)
    else:
        y = jnp.einsum("...i,io->...o", x, dequantize_kernel(p, x.dtype))
    if "lora_A" in p:
        # low-rank path: x @ A @ B (scaling 1.0, alpha==rank; see lora/lora.py)
        y = y + jnp.einsum("...r,ro->...o", jnp.einsum("...i,ir->...r", x, p["lora_A"].astype(x.dtype)), p["lora_B"].astype(x.dtype))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _conv(kernel, x, stride, padding, dilation, groups):
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def conv2d(p, x, stride: int | tuple = 1, padding="SAME", dilation: int = 1, groups: int = 1):
    """NHWC conv. padding: "SAME", "VALID", int, or ((t,b),(l,r))."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    kernel = p["kernel"].astype(x.dtype)
    y = _conv(kernel, x, stride, padding, dilation, groups)
    if "lora_A" in p:
        # peft Conv2d LoRA: conv with A (base geometry) then 1x1 conv with B
        h = _conv(p["lora_A"].astype(x.dtype), x, stride, padding, dilation, groups)
        y = y + _conv(p["lora_B"].astype(x.dtype), h, (1, 1), "VALID", 1, 1)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def group_norm(p, x, num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm over NHWC, statistics in fp32 (torch computes in fp32 too)."""
    b, h, w, c = x.shape
    orig_dtype = x.dtype
    xg = x.astype(jnp.float32).reshape(b, h, w, num_groups, c // num_groups)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xg.reshape(b, h, w, c)
    return (xn * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)).astype(orig_dtype)


def layer_norm(p, x, eps: float = 1e-5):
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["scale"].astype(jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def rms_norm(p, x, eps: float = 1e-6):
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    if p is not None:
        y = y * p["scale"].astype(jnp.float32)
    return y.astype(orig_dtype)


def silu(x):
    return jax.nn.silu(x)


# opt-in: the Pallas fused GN+SiLU kernel wins in isolation (2.22 vs 2.60 ms
# on a 512x512x128 v5e tensor) but LOSES in the composed one-step graph
# (176 vs 91 ms end-to-end): pallas_call is an XLA fusion barrier at ~60 GN
# sites, costing more than the saved reduction pass. Measured 2026-08-16.
USE_FUSED_GROUP_NORM = False


def group_norm_silu(p, x, num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm followed by SiLU; optionally dispatches to the fused Pallas
    kernel (see USE_FUSED_GROUP_NORM note — XLA's fusion wins end-to-end)."""
    if (
        USE_FUSED_GROUP_NORM
        and jax.default_backend() == "tpu"
        and x.shape[-1] % num_groups == 0
    ):
        from omgsr_tpu.ops.fused_groupnorm import fused_group_norm_silu

        return fused_group_norm_silu(x, p["scale"], p["bias"], num_groups, eps)
    return silu(group_norm(p, x, num_groups, eps))


def gelu(x, approximate: bool = False):
    return jax.nn.gelu(x, approximate=approximate)


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
    scale: float = 1.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, matching diffusers' get_timestep_embedding
    semantics (the reference's UNet consumes timestep 273 through this,
    infer/omgsr_s_infer_model.py:75-79 via diffusers).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        emb = jnp.concatenate([cos, sin], axis=-1)
    else:
        emb = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def nearest_upsample_2x(x):
    """Nearest-neighbor 2x upsample on NHWC (diffusers Upsample2D interpolate)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample_conv_2x(p, x):
    """nearest_upsample_2x followed by a 3x3 SAME conv, computed as four
    phase-decomposed 2x2 convs at LOW resolution + pixel interleave.

    Identical output, but 16 taps/output instead of 36 (2.25x fewer FLOPs)
    and the 2x-upsampled tensor never materializes — this is the hot op of
    the VAE decoder (Upsample2D in diffusers).

    Derivation: out[2i+d, 2j+e] = sum_{u,v} W[u,v] X[floor((2i+d+u-1)/2),
    floor((2j+e+v-1)/2)]; for d=0 the row taps collapse to {i-1: W[0],
    i: W[1]+W[2]}, for d=1 to {i: W[0]+W[1], i+1: W[2]} (same per column).
    """
    if "lora_A" in p:
        # LoRA-adapted upsampler ("conv" is a LoRA target): take the plain
        # path so the low-rank delta applies
        return conv2d(p, nearest_upsample_2x(x), padding=1)
    w = p["kernel"].astype(x.dtype)  # (3, 3, I, O)
    b, h, ww_, c = x.shape

    # collapsed 2-tap kernels per phase and axis
    def collapse(wk, d, axis):
        # returns (2, ...) taps over input offsets {-1+d, 0+d} along `axis`
        if d == 0:
            first = jax.lax.index_in_dim(wk, 0, axis, keepdims=True)
            second = jax.lax.index_in_dim(wk, 1, axis, keepdims=True) + jax.lax.index_in_dim(wk, 2, axis, keepdims=True)
        else:
            first = jax.lax.index_in_dim(wk, 0, axis, keepdims=True) + jax.lax.index_in_dim(wk, 1, axis, keepdims=True)
            second = jax.lax.index_in_dim(wk, 2, axis, keepdims=True)
        return jnp.concatenate([first, second], axis=axis)

    phases = []
    for d in (0, 1):
        wr = collapse(w, d, 0)  # (2, 3, I, O)
        for e in (0, 1):
            wk = collapse(wr, e, 1)  # (2, 2, I, O)
            pad_r = (1 - d, d)  # d=0: input rows i-1..i -> pad top
            pad_c = (1 - e, e)
            y = jax.lax.conv_general_dilated(
                x, wk, (1, 1), (pad_r, pad_c),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            phases.append(y)

    o = w.shape[-1]
    out = jnp.stack(phases).reshape(2, 2, b, h, ww_, o)
    out = out.transpose(2, 3, 0, 4, 1, 5).reshape(b, 2 * h, 2 * ww_, o)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def avg_pool_2x(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def depthwise_conv2d(p, x, stride: int = 1, padding="SAME", dilation: int = 1):
    """Depthwise conv; kernel stored (H, W, 1, C)."""
    return conv2d(p, x, stride=stride, padding=padding, dilation=dilation, groups=x.shape[-1])


def count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))
