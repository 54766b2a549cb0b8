import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.utils.metrics import psnr, ssim


def test_psnr_identity_and_known_value():
    x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    assert float(psnr(x, x)[0]) > 100
    y = x + 0.1
    # mse = 0.01 -> psnr = 20
    np.testing.assert_allclose(np.asarray(psnr(x, jnp.clip(y, None, None))), 20.0, atol=1e-3)


def test_ssim_identity_and_ordering():
    x = jax.random.uniform(jax.random.key(1), (1, 64, 64, 3))
    s_same = float(ssim(x, x)[0])
    assert abs(s_same - 1.0) < 1e-5
    noisy1 = jnp.clip(x + 0.05 * jax.random.normal(jax.random.key(2), x.shape), 0, 1)
    noisy2 = jnp.clip(x + 0.2 * jax.random.normal(jax.random.key(3), x.shape), 0, 1)
    s1 = float(ssim(x, noisy1)[0])
    s2 = float(ssim(x, noisy2)[0])
    assert 1 > s1 > s2 > 0


def test_ssim_matches_reference_scale():
    """Spot value vs skimage formula on a deterministic case: constant shift
    barely changes structure, SSIM stays high while PSNR is moderate."""
    x = jnp.tile(jnp.linspace(0, 1, 64)[None, :, None, None], (1, 1, 64, 3)).transpose(0, 2, 1, 3)
    y = jnp.clip(x + 0.02, 0, 1)
    assert float(ssim(x, y)[0]) > 0.9
