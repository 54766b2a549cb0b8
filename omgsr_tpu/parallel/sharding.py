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
