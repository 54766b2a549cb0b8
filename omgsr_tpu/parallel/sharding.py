"""Mesh + sharding helpers: the TPU-native replacement for the reference's
Accelerate/NCCL data parallelism (SURVEY.md §2c).

The reference scales with DDP only (accelerate launch --multi_gpu,
train_omgsr_s_512.sh:2-7): gradients all-reduced by NCCL on backward. Here
the same strategy is a 1-D "data" mesh axis: the batch is sharded over
"data", params are replicated, and XLA inserts the psum for gradient
averaging when the jitted train step runs under the mesh — collectives ride
ICI without any explicit communication code.

An optional "fsdp" axis shards large parameter tensors (ZeRO-3 style, the
capability the reference only vendors unused via FSDP2,
dinov3/fsdp/ac_compile_parallelize.py:104-151) — required to train/serve the
12B FLUX DiT on small slices. XLA turns the sharded-parameter matmuls into
all-gather + reduce-scatter pairs automatically.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: dict | None = None, devices=None) -> Mesh:
    """shape e.g. {"data": 4} or {"data": 2, "fsdp": 4}; None -> all devices
    on a 1-D data axis."""
    devices = devices if devices is not None else jax.devices()
    if not shape:
        shape = {"data": len(devices)}
    names = tuple(shape.keys())
    dims = tuple(shape.values())
    if int(np.prod(dims)) != len(devices):
        raise ValueError(f"mesh {shape} does not match {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(dims)
    return Mesh(dev_array, names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape, fsdp_size: int, min_size: int) -> P:
    """Shard the largest dim divisible by fsdp_size; replicate otherwise."""
    if int(np.prod(shape)) < min_size:
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def shard_params_fsdp(params, mesh: Mesh, min_size: int = 2**18):
    """NamedSharding tree for params: big tensors sharded over "fsdp"
    (if the mesh has that axis), small ones replicated."""
    if "fsdp" not in mesh.axis_names:
        rep = replicated(mesh)
        return jax.tree.map(lambda _: rep, params)
    fsdp_size = mesh.shape["fsdp"]

    def spec_for(leaf):
        return NamedSharding(mesh, _fsdp_spec(leaf.shape, fsdp_size, min_size))

    return jax.tree.map(spec_for, params)


def device_put_params(params, shardings):
    return jax.tree.map(jax.device_put, params, shardings)


# ----------------------------------------------------------------------------
# tensor parallelism for the FLUX DiT (SURVEY §2c optional TP — needed because
# FLUX-12B bf16 exceeds one v5e's HBM and fsdp gathers serialize the matmuls)
# ----------------------------------------------------------------------------

# Megatron-style split of every transformer block, expressed purely as
# parameter shardings — XLA's SPMD partitioner propagates them through the
# reshape to heads, keeps attention per-head local to its "tp" shard, and
# inserts one reduce-scatter/all-reduce at each row-parallel projection.
#   column-parallel (shard the OUT dim = heads / ffn-hidden):
_TP_COL = frozenset(
    {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj", "add_v_proj", "proj_mlp"}
)
#   row-parallel (shard the IN dim; output re-assembled by a collective):
_TP_ROW = frozenset({"to_out", "to_add_out"})


def _flux_tp_spec(keys: tuple, shape: tuple):
    """PartitionSpec for one FLUX block leaf under TP, or None if the leaf
    is not TP-split. ``keys`` is the dict-key path, ``shape`` the leaf shape
    (a leading block axis from stack_block_params is never sharded)."""
    in_blocks = "transformer_blocks" in keys or "single_transformer_blocks" in keys
    if not in_blocks:
        return None
    ks = set(keys)
    # inside an ff/ff_context subtree, the up-projection is the only dense
    # under a "proj" key (net.0.proj); the down-projection is net.2. Do NOT
    # match on numeric keys — unrolled layouts carry block indices ("0",
    # "2") in the same path and would collide.
    in_ff = "ff" in ks or "ff_context" in ks
    col = bool(ks & _TP_COL) or (in_ff and "proj" in ks)
    row = bool(ks & _TP_ROW) or (
        (in_ff and "proj" not in ks)
        or ("single_transformer_blocks" in ks and "proj_out" in ks)
    )
    if not (col or row):
        return None  # norms, modulation dense, rms scales: replicated
    leaf = keys[-1]
    if leaf == "act_quant":
        return P()  # w8a8 marker: a tiny flag leaf, always replicated
    nd = len(shape)
    if col:
        # kernel (.., in, out) / bias (.., out): shard the out (last) dim
        spec = [None] * nd
        spec[-1] = "tp"
        return P(*spec)
    if leaf in ("bias", "kernel_scale"):
        # row-parallel bias is added once post-collective; int8 per-out
        # -channel scales (utils.quantize) have no "in" dim — every shard
        # dequantizes with the full scale vector. Group-wise int4 scales
        # (…, in/g, out) DO carry the in dim (one extra axis vs per-channel:
        # (out,)->(G,out) plain, (L,out)->(L,G,out) stacked) and must shard
        # with the kernel's in rows so each shard dequantizes its slice.
        per_channel_nd = 2 if "stacked" in ks else 1
        if leaf == "kernel_scale" and nd == per_channel_nd + 1:
            spec = [None] * nd
            spec[-2] = "tp"
            return P(*spec)
        return P()
    spec = [None] * nd
    spec[-2] = "tp"  # kernel (.., in, out): shard the in dim
    return P(*spec)


def shard_params_flux_tp(params, mesh: Mesh, min_size: int = 2**18):
    """NamedSharding tree for a FLUX param tree: Megatron TP over the mesh's
    "tp" axis for the transformer blocks (attention heads + ffn hidden),
    fsdp/replication for everything else. Requires num_attention_heads and
    ffn hidden to be divisible by mesh.shape["tp"]. Works for both unrolled
    and stacked (lax.scan) block layouts."""
    if "tp" not in mesh.axis_names:
        raise ValueError('mesh has no "tp" axis')
    has_fsdp = "fsdp" in mesh.axis_names
    fsdp_size = mesh.shape.get("fsdp", 1)

    def spec_for(path, leaf):
        keys = tuple(
            p.key for p in path if isinstance(p, jax.tree_util.DictKey)
        )
        spec = _flux_tp_spec(keys, leaf.shape)
        if spec is None:
            spec = (
                _fsdp_spec(leaf.shape, fsdp_size, min_size) if has_fsdp else P()
            )
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_for, params)
