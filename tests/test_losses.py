import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.losses.diffaug import diff_augment
from omgsr_tpu.losses.discriminator import (
    _spectral_normalize,
    blur_pool,
    discriminator_loss,
    init_discriminator,
)
from omgsr_tpu.losses.dists import dists_loss, init_dists, l2_pool
from omgsr_tpu.models import convnext as CN
from omgsr_tpu.models.configs import ConvNeXtConfig

TINY_CN = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32))


def _backbone():
    return CN.init_convnext(jax.random.key(0), TINY_CN)


class TestDISTS:
    def test_zero_distance_for_identical(self):
        bp = _backbone()
        st = init_dists(bp, TINY_CN.dims)
        x = jnp.tanh(jax.random.normal(jax.random.key(1), (2, 64, 64, 3)))
        d = jax.jit(lambda s, a, b: dists_loss(s, a, b))(st, x, x)
        # identical inputs: S1 = S2 = 1 per channel -> score = 1 - 2*sum(w*C) = 0
        assert abs(float(d)) < 1e-4

    def test_positive_for_different(self):
        bp = _backbone()
        st = init_dists(bp, TINY_CN.dims)
        x = jnp.tanh(jax.random.normal(jax.random.key(1), (1, 64, 64, 3)))
        y = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 64, 64, 3)))
        d = float(dists_loss(st, x, y))
        assert d > 0.01

    def test_gradient_flows_to_input_not_backbone(self):
        bp = _backbone()
        st = init_dists(bp, TINY_CN.dims)
        x = jnp.tanh(jax.random.normal(jax.random.key(1), (1, 32, 32, 3)))
        y = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
        gx = jax.grad(lambda x: dists_loss(st, x, y))(x)
        assert float(jnp.abs(gx).max()) > 0

    def test_l2pool_hanning_matches_reference(self):
        """L2pooling kernel: np.hanning(5)[1:-1] outer product, normalized
        (dinov3_gan/dinov3_convnext_dists.py:7-29)."""
        a = np.hanning(5)[1:-1]
        g = np.outer(a, a)
        g = g / g.sum()
        x = jnp.ones((1, 5, 5, 1))
        out = np.asarray(l2_pool(x))
        # interior pixel: sqrt(sum(g * 1^2)) = 1
        np.testing.assert_allclose(out[0, 2, 2, 0], 1.0, rtol=1e-5)


class TestDiffAugment:
    def test_shapes_and_determinism(self):
        x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
        a = diff_augment(jax.random.key(1), x)
        b = diff_augment(jax.random.key(1), x)
        c = diff_augment(jax.random.key(2), x)
        assert a.shape == x.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6

    def test_cutout_zeroes_region(self):
        x = jnp.ones((1, 16, 16, 3))
        out = np.asarray(diff_augment(jax.random.key(3), x, "cutout"))
        n_zero = (out == 0).sum()
        assert 0 < n_zero <= 3 * 8 * 8 + 3 * 16  # about half-size window

    def test_empty_policy_identity(self):
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 3))
        np.testing.assert_array_equal(np.asarray(diff_augment(jax.random.key(1), x, "")), np.asarray(x))


class TestDiscriminator:
    def test_blur_pool_halves(self):
        x = jax.random.normal(jax.random.key(0), (1, 16, 16, 4))
        y = blur_pool(x)
        assert y.shape == (1, 8, 8, 4)
        # constant input preserved (kernel normalized) away from borders
        c = blur_pool(jnp.ones((1, 16, 16, 1)))
        np.testing.assert_allclose(np.asarray(c)[0, 2:-2, 2:-2, 0], 1.0, rtol=1e-5)

    def test_spectral_normalize_unit_norm(self):
        k = jax.random.normal(jax.random.key(0), (3, 3, 8, 16)) * 3.0
        u = jax.random.normal(jax.random.key(1), (16,))
        wn, u2 = _spectral_normalize(k, u)
        for _ in range(30):  # converge power iteration
            wn, u2 = _spectral_normalize(k, u2)
        w2d = np.asarray(wn, np.float64).reshape(-1, 16)
        sigma = np.linalg.svd(w2d, compute_uv=False)[0]
        np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)

    def test_disc_loss_and_state(self):
        bp = _backbone()
        dp, sn, meta = init_discriminator(jax.random.key(1), TINY_CN.dims[:3], 512)
        x = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 512, 512, 3)))
        loss, new_sn = jax.jit(
            lambda dp, sn, x: discriminator_loss(dp, sn, meta, bp, jax.random.key(3), x, for_real=True)
        )(dp, sn, x)
        assert np.isfinite(float(loss))
        assert jax.tree.structure(new_sn) == jax.tree.structure(sn)

    def test_disc_gradients(self):
        bp = _backbone()
        dp, sn, meta = init_discriminator(jax.random.key(1), TINY_CN.dims[:3], 512)
        x = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 512, 512, 3)))

        def loss_fn(dp):
            l, _ = discriminator_loss(dp, sn, meta, bp, jax.random.key(3), x, for_real=False)
            return l

        g = jax.grad(loss_fn)(dp)
        gmax = max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g))
        assert gmax > 0

    def test_G_loss_lower_when_logits_high(self):
        """for_G=True targets alpha=0.8 'real': the loss must decrease as the
        discriminator is more fooled. Compare fake vs real-image losses under
        the same params — just a smoke monotonicity check on targets."""
        bp = _backbone()
        dp, sn, meta = init_discriminator(jax.random.key(1), TINY_CN.dims[:3], 512)
        x = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 512, 512, 3)))
        lg, _ = discriminator_loss(dp, sn, meta, bp, jax.random.key(3), x, for_G=True)
        lf, _ = discriminator_loss(dp, sn, meta, bp, jax.random.key(3), x, for_real=False)
        # same logits, different targets (0.8 vs 0): losses differ
        assert abs(float(lg) - float(lf)) > 1e-6

    def test_1024_head_config_deeper(self):
        bp = _backbone()
        dp512, _, m512 = init_discriminator(jax.random.key(1), TINY_CN.dims[:3], 512)
        dp1024, _, m1024 = init_discriminator(jax.random.key(1), TINY_CN.dims[:3], 1024)
        assert len(m512["0"]) == 3 and len(m1024["0"]) == 4
        assert len(dp1024["decoders"]["0"]) == 5  # 4 convs + final
