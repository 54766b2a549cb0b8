"""Pallas 3x3 conv kernel tests (interpret mode on CPU; real kernel on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.ops.conv3x3 import conv3x3_pallas, conv3x3_reference


@pytest.fixture(autouse=True)
def _interpret_on_cpu(monkeypatch):
    if jax.default_backend() != "tpu":
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


@pytest.mark.parametrize("h,w_,cin,cout,act", [
    (16, 128, 128, 128, "none"),
    (16, 128, 128, 128, "silu"),
    (32, 256, 128, 256, "none"),
    (8, 128, 256, 128, "silu"),
])
def test_matches_xla_conv(h, w_, cin, cout, act):
    ks = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(ks[0], (1, h, w_, cin), jnp.float32) * 0.5
    w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    ours = conv3x3_pallas(x, w, b, act=act, bh=8)
    ref = conv3x3_reference(x, w, b, act=act)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_bf16_close_to_f32_reference():
    ks = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(ks[0], (1, 16, 128, 128), jnp.float32)
    w = jax.random.normal(ks[1], (3, 3, 128, 128), jnp.float32) * 0.05
    b = jnp.zeros((128,))
    ours = conv3x3_pallas(x.astype(jnp.bfloat16), w, b, bh=8)
    assert ours.dtype == jnp.bfloat16
    ref = conv3x3_reference(x, w, b)
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), np.asarray(ref), atol=0.15, rtol=0.05
    )


def test_edge_padding_correct():
    """SAME zero padding at all four borders (the kernel pre-pads)."""
    x = jnp.ones((1, 8, 128, 128), jnp.float32)
    w = jnp.ones((3, 3, 128, 128), jnp.float32)
    b = jnp.zeros((128,))
    out = np.asarray(conv3x3_pallas(x, w, b, bh=8))
    # interior: 9 taps * 128 channels; corners: 4 taps; edges: 6 taps
    np.testing.assert_allclose(out[0, 4, 64], 9 * 128, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 0], 4 * 128, rtol=1e-6)
    np.testing.assert_allclose(out[0, 0, 64], 6 * 128, rtol=1e-6)
    np.testing.assert_allclose(out[0, 4, 127], 6 * 128, rtol=1e-6)
