"""Flash-attention kernel tests (interpret mode on CPU; real kernel on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.ops import flash_attention as FA


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


@pytest.mark.parametrize("shape", [(1, 256, 2, 64), (2, 300, 1, 64)])
def test_matches_xla_attention(shape):
    b, s, h, d = shape
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], shape, jnp.float32)
    k = jax.random.normal(ks[1], shape, jnp.float32)
    v = jax.random.normal(ks[2], shape, jnp.float32)
    ours = FA.flash_attention_bshd(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_scale_override():
    shape = (1, 128, 1, 64)
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    ours = FA.flash_attention_bshd(q, k, v, 0.5)
    ref = jax.nn.dot_product_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_gradients_flow():
    shape = (1, 128, 1, 64)
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)

    def loss_flash(q, k, v):
        return FA.flash_attention_bshd(q, k, v).sum()

    def loss_ref(q, k, v):
        return jax.nn.dot_product_attention(q, k, v).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3, rtol=2e-3)


def test_wide_head_long_seq_matches_xla():
    """512-dim single-head long-seq case (VAE mid block at 1024px+): the kv
    -blocked grid must not require resident KV in VMEM and must still match
    XLA numerically."""
    shape = (1, 2048, 1, 512)
    ks = jax.random.split(jax.random.key(5), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) for kk in ks)
    ours = FA.flash_attention_bshd(q, k, v)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=3e-3, rtol=3e-3)


def test_gradients_flow_wide_head():
    """Backward with the q/kv-blocked grids at d=512 (VAE mid head)."""
    shape = (1, 640, 1, 512)
    ks = jax.random.split(jax.random.key(7), 3)
    q, k, v = (jax.random.normal(kk, shape, jnp.float32) * 0.2 for kk in ks)

    def loss_flash(q, k, v):
        return (FA.flash_attention_bshd(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (jax.nn.dot_product_attention(q, k, v) ** 2).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=5e-3)
