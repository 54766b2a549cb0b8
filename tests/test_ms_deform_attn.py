"""ms_deform_attn: JAX op vs torch grid_sample golden vs C++ CPU kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.ops.ms_deform_attn import ms_deform_attn


def _torch_golden(value, shapes, locs, weights):
    """Canonical formula via torch.grid_sample (the reference's debug
    implementation semantics, functions/ms_deform_attn_func.py:57-79)."""
    import torch
    import torch.nn.functional as TF

    value = torch.from_numpy(value)
    locs = torch.from_numpy(locs)
    weights = torch.from_numpy(weights)
    N, S, M, D = value.shape
    _, Q, _, L, P, _ = locs.shape
    value_list = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * locs - 1
    sampled = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N * M, D, h, w)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(
            TF.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        )
    weights = weights.transpose(1, 2).reshape(N * M, 1, Q, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * weights).sum(-1).view(N, M * D, Q)
    return out.transpose(1, 2).contiguous().numpy()


def _random_case(seed=0, b=2, q=5, m=2, d=4, shapes=((6, 8), (3, 4))):
    rng = np.random.default_rng(seed)
    s = sum(h * w for h, w in shapes)
    L = len(shapes)
    p = 3
    value = rng.normal(size=(b, s, m, d)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(b, q, m, L, p, 2)).astype(np.float32)
    w = rng.uniform(size=(b, q, m, L, p)).astype(np.float32)
    w /= w.sum(axis=(3, 4), keepdims=True)
    return value, shapes, locs, w


def test_jax_matches_torch_golden():
    value, shapes, locs, w = _random_case()
    ref = _torch_golden(value, shapes, locs, w)
    ours = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_cpp_matches_jax():
    import shutil

    if shutil.which("g++") is None:
        pytest.skip("no g++")
    from omgsr_tpu.ops.msda_native import ms_deform_attn_cpu

    value, shapes, locs, w = _random_case(seed=1)
    ref = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
    )
    ours = ms_deform_attn_cpu(value, np.asarray(shapes), locs, w)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_gradients_exist():
    value, shapes, locs, w = _random_case(seed=2)

    def loss(value, locs, w):
        return ms_deform_attn(value, shapes, locs, w).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
    )
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert float(jnp.abs(g[0]).max()) > 0

    # finite-difference check on attention weights (linear -> exact)
    eps = 1e-3
    w2 = w.copy()
    w2[0, 0, 0, 0, 0] += eps
    f0 = float(loss(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)))
    f1 = float(loss(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w2)))
    np.testing.assert_allclose((f1 - f0) / eps, float(np.asarray(g[2])[0, 0, 0, 0, 0]), rtol=2e-2)


def test_jit_compatible():
    value, shapes, locs, w = _random_case(seed=3)
    fn = jax.jit(lambda v, l, ww: ms_deform_attn(v, shapes, l, ww))
    out = fn(jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w))
    assert out.shape == (2, 5, 8)
