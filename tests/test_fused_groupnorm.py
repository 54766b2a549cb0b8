import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.models.layers import group_norm, silu
from omgsr_tpu.ops.fused_groupnorm import fused_group_norm_silu


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("shape,groups", [((1, 16, 16, 32), 4), ((2, 8, 24, 16), 8), ((1, 30, 10, 32), 32)])
def test_matches_unfused(shape, groups):
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 2 + 0.5
    scale = jax.random.normal(jax.random.key(1), (shape[-1],)) * 0.1 + 1
    bias = jax.random.normal(jax.random.key(2), (shape[-1],)) * 0.1
    p = {"scale": scale, "bias": bias}
    ref = silu(group_norm(p, x, groups, 1e-6))
    out = fused_group_norm_silu(x, scale, bias, groups, 1e-6, block_rows=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_no_silu_mode():
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 16))
    scale = jnp.ones(16)
    bias = jnp.zeros(16)
    ref = group_norm({"scale": scale, "bias": bias}, x, 4, 1e-6)
    out = fused_group_norm_silu(x, scale, bias, 4, 1e-6, apply_silu=False, block_rows=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_bf16_io():
    x = jax.random.normal(jax.random.key(0), (1, 16, 16, 32), jnp.bfloat16)
    scale = jnp.ones(32, jnp.bfloat16)
    bias = jnp.zeros(32, jnp.bfloat16)
    out = fused_group_norm_silu(x, scale, bias, 4, block_rows=64)
    assert out.dtype == jnp.bfloat16
    ref = silu(group_norm({"scale": scale, "bias": bias}, x, 4, 1e-6))
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2, rtol=2e-2
    )
