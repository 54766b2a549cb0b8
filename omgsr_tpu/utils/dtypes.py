"""Dtype policy helpers.

The reference trains/infers in bf16 ("mixed_precision: bf16",
configs/omgsr_s_512.yml:42) with fp32 optimizer math inside torch AMP. On TPU
we mirror this as: bf16 activations/frozen params (MXU-native), fp32 master
copies for trainable params and optimizer state.
"""

import jax.numpy as jnp

DTYPE_MAP = {
    "no": jnp.float32,  # accelerate's --mixed_precision=no
    "fp32": jnp.float32,
    "float32": jnp.float32,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
    "fp16": jnp.float16,
    "float16": jnp.float16,
}


def resolve_dtype(name):
    if isinstance(name, str):
        return DTYPE_MAP[name]
    return name
