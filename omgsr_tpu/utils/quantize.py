"""Weight-only int8 compression for dense param trees.

Purpose: FLUX.1-dev's 11.9B-param DiT is 23.8 GB in bf16 — larger than one
TPU v5e's 16 GB HBM (the reference serves it on a >24 GB CUDA GPU,
infer/omgsr_f_infer_model.py:103). Per-output-channel symmetric int8
storage halves the weight bytes to 11.9 GB, which fits, turning the -F
pipeline into a true single-chip path (multi-chip TP/FSDP shardings remain
the full-precision option).

Design: storage-only quantization. A dense kernel (in, out) [or a
scan-stacked (L, in, out)] is replaced by `kernel_q` int8 plus a
per-output-channel `kernel_scale` f32; `models.layers.dense` dequantizes to
the activation dtype at use, so the matmul itself stays bf16 on the MXU and
every model/pipeline works unchanged. Under scan-over-blocks the stacked
int8 leaf is sliced per iteration, so only one block's bf16 copy is ever
live — the dequantized model never materializes.

Quantize AFTER LoRA merge-and-unload (adapters fold into bf16 base weights
first); LoRA deltas attached on top of a quantized base still apply (the
low-rank path in `dense` is independent of kernel storage).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kernel_int8(w):
    """(…, in, out) float kernel -> (int8 kernel_q, f32 per-out-channel scale)."""
    w32 = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w32), axis=-2) / 127.0  # (…, out)
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -127, 127).astype(jnp.int8)
    return q, scale


# default in-dim group size for int4. The win over per-output-channel
# scales depends on the weight distribution (MEASURED via
# tools/probe_int4_quality.py --weights …, full-width FLUX blocks, forward
# rel deviation): ~equal on kaiming-UNIFORM random init (absmax saturates
# within any 128-sample group: 16.96% vs 16.73%), 1.25x on gaussian
# (27.6% vs 34.6%; g=64: 25.4%), 1.28x/2.05x at g=128/g=64 on heavy-tailed
# outlier input rows (98.6%/61.6% vs 125.9%) — the regime real trained
# checkpoints live in (GPTQ/AWQ-style g=128 is standard for it). Cost is
# f32 scales / (g·int4) = +6% bytes at g=128 — group-wise is never
# meaningfully worse, so it is the default; re-probe on real weights the
# day they mount. int4 remains a documented lower-fidelity memory mode:
# int8 (0.88-2.0% dev) is the serving-quality storage.
INT4_GROUP_SIZE = 128


def quantize_kernel_int4(w, group_size: int | None = INT4_GROUP_SIZE):
    """(…, in, out) float kernel -> (uint8 kernel_q4 nibble-packed along the
    in axis, f32 scale — per-(in-group, out-channel) of shape (…, in/g, out)
    when `group_size` divides in, else per-out-channel (…, out)).

    4-bit symmetric storage (scale = group absmax/7, codes in [-7, 7] stored
    offset-8): HALVES the int8 footprint again — the 11.9 GB int8 frozen 12B
    DiT becomes ~5.95 GB, the margin that fits the -F LoRA-GAN train step
    (measured ~20.3 GB with an int8 base vs 15.75 GB HBM) on ONE v5e.
    Storage-only: dequantize_kernel unpacks per scan block to the compute
    dtype, so the matmul stays bf16 on the MXU. Requires an even in dim
    (two codes per byte). Capability ≙ the vendored low-precision linear
    (dinov3/layers/fp8_linear.py), re-targeted at what the v5e lacks (fp8)."""
    w32 = jnp.asarray(w, jnp.float32)
    in_dim = w32.shape[-2]
    if in_dim % 2:
        raise ValueError(f"int4 packing needs an even in dim, got {w32.shape}")
    lead, out = w32.shape[:-2], w32.shape[-1]
    if group_size and in_dim % group_size == 0 and in_dim > group_size:
        g = group_size
        wg = w32.reshape(*lead, in_dim // g, g, out)
        scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-12)  # (…, in/g, out)
        q = jnp.clip(jnp.round(wg / scale[..., None, :]), -7, 7) + 8.0
        q = q.reshape(*lead, in_dim, out)
    else:
        scale = jnp.maximum(jnp.max(jnp.abs(w32), axis=-2) / 7.0, 1e-12)  # (…, out)
        q = jnp.clip(jnp.round(w32 / scale[..., None, :]), -7, 7) + 8.0  # [1, 15]
    q = q.astype(jnp.uint8)
    packed = q[..., 0::2, :] | (q[..., 1::2, :] << 4)
    return packed, scale


def unpack_int4(packed):
    """uint8 (…, in/2, out) nibble-packed -> int8 codes (…, in, out) in
    [-7, 7] (element order restored: low nibble first)."""
    lo = (packed & 0x0F).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    pair = jnp.stack([lo, hi], axis=-2)  # (…, in/2, 2, out)
    return pair.reshape(*packed.shape[:-2], 2 * packed.shape[-2], packed.shape[-1])


def dequantize_kernel(p, dtype):
    """Materialize a (possibly quantized) kernel in `dtype`."""
    if "kernel" in p:
        return p["kernel"].astype(dtype)
    # multiply in f32 (the scale's native precision) before casting: casting
    # the scale to bf16 first adds ~0.2-0.4% systematic per-channel error on
    # top of int8 rounding. Under scan only one block's f32 copy is live.
    if "kernel_q4" in p:
        w = unpack_int4(p["kernel_q4"]).astype(jnp.float32)
    else:
        w = p["kernel_q"].astype(jnp.float32)
    scale = p["kernel_scale"]
    if scale.ndim == w.ndim:
        # group-wise (…, in/g, out): broadcast each group scale over its g
        # in-rows; XLA fuses the reshape/mul into the dequant like the
        # per-channel case (no extra materialization under scan)
        lead, out = w.shape[:-2], w.shape[-1]
        groups = scale.shape[-2]
        wg = w.reshape(*lead, groups, w.shape[-2] // groups, out)
        w = (wg * scale[..., None, :]).reshape(*lead, w.shape[-2], out)
        return w.astype(dtype)
    return (w * scale[..., None, :]).astype(dtype)


# Subtrees whose dense layers keep weight-only dequantization even under
# act_quant=True: AdaLN/modulation and embedder matmuls see a sequence length
# of 1 (negligible FLOPs — the int8 MXU buys nothing) and their outputs
# (scale/shift/gate vectors) steer every token, so they stay in bf16 compute.
W8A8_EXCLUDE = frozenset(
    {"norm", "norm1", "norm1_context", "norm_out", "time_text_embed"}
)


def quantize_tree_int8(tree, min_params: int = 1 << 16, act_quant: bool = False, bits: int = 8,
                       group_size: int | None = INT4_GROUP_SIZE):
    """Replace every dense kernel (2-D, or 3-D scan-stacked) with at least
    `min_params` elements by int8 + scale. Conv kernels (4-D), norms, biases,
    embeddings and LoRA factors stay in their original dtype. Returns a new
    tree; does not modify the input.

    act_quant=True additionally marks each quantized dense (outside
    W8A8_EXCLUDE subtrees) with an `act_quant` flag leaf: `layers.dense` then
    quantizes the activation per token and runs the matmul s8 x s8 -> s32 on
    the MXU (inference-only — the rounding is non-differentiable; training
    uses weight-only storage). Measured on the 12B DiT protocol: 1.38x over
    weight-only (the v5e's datasheet 2x int8 rate is not reachable through
    this XLA stack — see CLAUDE.md perf notes).

    bits=4 stores nibble-packed int4 instead (quantize_kernel_int4) —
    training-memory mode for the frozen 12B base; kernels with an odd in
    dim fall back to int8. Incompatible with act_quant (the w8a8 MXU path
    consumes int8 codes)."""
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if bits == 4 and act_quant:
        raise ValueError("act_quant (w8a8) requires int8 codes; use bits=8")

    def rec(node, excluded):
        if not isinstance(node, dict):
            return node
        k = node.get("kernel")
        if (
            k is not None
            and hasattr(k, "ndim")
            and k.ndim in (2, 3)
            and k.size >= min_params
            and jnp.issubdtype(jnp.asarray(k).dtype, jnp.floating)
        ):
            q4 = bits == 4 and k.shape[-2] % 2 == 0
            q, scale = (
                quantize_kernel_int4(k, group_size=group_size)
                if q4
                else quantize_kernel_int8(k)
            )
            # recurse into the sibling values too (nested sub-dicts sharing a
            # level with a large kernel must not silently stay unquantized)
            out = {
                kk: rec(vv, excluded or kk in W8A8_EXCLUDE)
                for kk, vv in node.items()
                if kk != "kernel"
            }
            out["kernel_q4" if q4 else "kernel_q"] = q
            out["kernel_scale"] = scale
            if act_quant and not excluded:
                # leading axis matches a scan-stacked kernel so lax.scan can
                # slice the marker along with the rest of the block subtree
                out["act_quant"] = jnp.zeros(
                    (k.shape[0],) if k.ndim == 3 else (), jnp.int8
                )
            return out
        if act_quant and "kernel_q4" in node:
            # an int4-stored kernel cannot serve w8a8 (the MXU path consumes
            # int8 codes) — refuse rather than silently serving weight-only
            raise ValueError(
                "act_quant requested on an int4-quantized kernel: int4 is a "
                "train-memory mode; requantize the float base at bits=8 for w8a8"
            )
        kq = node.get("kernel_q")
        if kq is not None and act_quant and not excluded and "act_quant" not in node:
            # already weight-only quantized (e.g. a checkpoint quantized
            # earlier): upgrading to w8a8 must still add the marker, not
            # silently serve at weight-only speed
            out = {
                kk: rec(vv, excluded or kk in W8A8_EXCLUDE) for kk, vv in node.items()
            }
            out["act_quant"] = jnp.zeros(
                (kq.shape[0],) if kq.ndim == 3 else (), jnp.int8
            )
            return out
        return {
            kk: rec(vv, excluded or kk in W8A8_EXCLUDE) for kk, vv in node.items()
        }

    return rec(tree, False)


def quantize_tree_int4(tree, min_params: int = 1 << 16, group_size: int | None = INT4_GROUP_SIZE):
    """quantize_tree_int8 at bits=4: nibble-packed weight-only storage with
    per-in-group scales for frozen bases under training (the -F 12B
    single-chip fit) and the documented int4 serving memory mode."""
    return quantize_tree_int8(tree, min_params=min_params, bits=4, group_size=group_size)


def tree_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def quantize_flux_for_serving(
    flux_params, act_quant: bool = False, bits: int = 8, min_params: int = 1 << 16,
    group_size: int | None = INT4_GROUP_SIZE,
):
    """Stack-then-quantize a (ported, LoRA-merged) FLUX tree on the host CPU
    backend and place only the int8 result on the default device — the
    accelerator never holds the bf16 stacked copy (23.8 GB for 12B).
    act_quant=True enables the w8a8 int8-MXU compute path (inference-only).
    bits=4 packs the frozen base to ~5.95 GB (training-fit mode)."""
    from omgsr_tpu.models import flux as flux_mod

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if "stacked" not in flux_params.get("transformer_blocks", {}):
            flux_params = flux_mod.stack_block_params(flux_params)
        flux_params = quantize_tree_int8(
            flux_params, min_params=min_params, act_quant=act_quant, bits=bits,
            group_size=group_size,
        )
    dev = jax.devices()[0]
    return jax.tree.map(lambda x: jax.device_put(x, dev), flux_params)


def init_flux_int8(
    key, cfg, block_dtype=jnp.bfloat16, repeat_blocks: bool = False,
    act_quant: bool = False, bits: int = 8, min_params: int = 1 << 16,
    group_size: int | None = INT4_GROUP_SIZE,
):
    """Initialize a FLUX param tree directly in int8-compressed form without
    ever materializing the full bf16 tree on the accelerator: blocks are
    initialized on the host CPU backend, quantized there, and only then
    placed on the default device. Used to stage the 12B DiT into one v5e's
    HBM (random weights; real checkpoints go through convert.porters +
    quantize_flux_for_serving the same way).

    repeat_blocks=True initializes ONE dual and ONE single block and repeats
    them across the scan stack — minutes faster on a slow host, identical
    compute/latency (weights are data to the scan), only for benchmarking."""
    from dataclasses import replace

    from omgsr_tpu.models import flux as flux_mod

    cpu = jax.devices("cpu")[0]
    if not repeat_blocks:
        with jax.default_device(cpu):
            params = flux_mod.init_flux(key, cfg, dtype=block_dtype)
        return quantize_flux_for_serving(
            params, act_quant=act_quant, bits=bits, min_params=min_params,
            group_size=group_size,
        )

    with jax.default_device(cpu):
        one = flux_mod.init_flux(
            key, replace(cfg, num_layers=1, num_single_layers=1), dtype=block_dtype
        )
        one = flux_mod.stack_block_params(one)
        one = quantize_tree_int8(
            one, min_params=min_params, act_quant=act_quant, bits=bits,
            group_size=group_size,
        )

    # Ship ONE block's leaves (~0.2 GB int8 at 12B) and replicate across the
    # scan stack ON THE DEVICE: transferring the host-repeated 11.1 GB tree
    # through the tunnel is what made staging take ~7.5 min (transfer-bound).
    # The jit materializes the broadcast into real device buffers.
    dev = jax.devices()[0]
    one = jax.tree.map(lambda x: jax.device_put(x, dev), one)

    def rep(n):
        return jax.jit(
            lambda t: jax.tree.map(
                lambda x: jnp.broadcast_to(x, (n,) + x.shape[1:]), t
            )
        )

    one["transformer_blocks"]["stacked"] = rep(cfg.num_layers)(
        one["transformer_blocks"]["stacked"]
    )
    one["single_transformer_blocks"]["stacked"] = rep(cfg.num_single_layers)(
        one["single_transformer_blocks"]["stacked"]
    )
    return one
